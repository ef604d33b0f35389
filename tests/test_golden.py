"""Golden regression fixtures for the DSP front-end.

The reference's numerical behavior was never unit-tested (SURVEY §4); this
framework freezes its own front-end outputs instead: any change to the
extraction pipeline (window, filterbanks, calibration, masking) must either
reproduce these fixtures or consciously regenerate them (see
tests/golden/README inside the npz docstring).  Analyses built on top are
covered by the transcription parity tests.
"""

import os

import numpy as np

from strugatzki_tpu.dsp.frontend import extract_features

# v3: regenerated for the rd1987 (pre-2003, anchor-fitted) contours (round 3)
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "features_v3.npz")


def _signals():
    sr = 44100.0
    rng = np.random.default_rng(123)
    t = np.arange(int(sr)) / sr
    return sr, {
        "sine1k": (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32),
        "multitone": (0.3 * np.sin(2 * np.pi * 220 * t)
                      + 0.2 * np.sin(2 * np.pi * 1867 * t)
                      + 0.1 * np.sin(2 * np.pi * 7040 * t)).astype(np.float32),
        "noise": (0.25 * rng.standard_normal(int(sr))).astype(np.float32),
        "chirpclick": np.concatenate([
            np.zeros(2000, np.float32),
            (0.8 * np.sin(2 * np.pi * (200 + 3000 * t[:20000]) * t[:20000]))
            .astype(np.float32),
            np.zeros(int(sr) - 22000, np.float32)]),
    }


def test_frontend_matches_golden():
    sr, signals = _signals()
    golden = np.load(GOLDEN)
    for name, x in signals.items():
        feats = extract_features(x, sr)
        ref = golden[name]
        assert feats.shape == ref.shape
        np.testing.assert_allclose(feats[0], ref[0], atol=3e-5,
                                   err_msg=f"{name} loudness")
        np.testing.assert_allclose(feats[1:], ref[1:], atol=3e-5,
                                   err_msg=f"{name} mfcc")
