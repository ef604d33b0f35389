"""UGen calibration harness.

The DSP front-end transcribes SuperCollider's MFCC/Loudness UGens
(docs/ML_DERIVATION.md grades each constant's provenance).  When a
reference-extracted feature file IS available (any machine with scsynth +
the Scala reference), this tool quantifies the remaining per-channel gap
and proposes constant adjustments for ``strugatzki_tpu/dsp/constants.py``:

    python tools/calibrate_ugens.py input.aif reference_feat.aif

It extracts features for ``input.aif`` with the current constants, aligns
frames, and fits a per-channel affine map ours → reference.  Because every
downstream analysis normalizes per channel and correlates (affine-invariant),
residuals AFTER the affine fit are the operative parity error; the affine
part itself folds into ``MFCC_SCALE``/``MFCC_OFFSET`` and the loudness
calibration.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from strugatzki_tpu.dsp.frontend import extract_features
from strugatzki_tpu.io import audiofile as af


def main(audio_path: str, ref_feat_path: str) -> None:
    ref, ref_spec = af.read(ref_feat_path)
    audio, spec = af.read(audio_path)
    mono = audio.sum(axis=0)

    step = int(round(spec.sample_rate / ref_spec.sample_rate))
    fft_size = step * 2  # assumes the default overlap of 2
    num_coeffs = ref_spec.num_channels - 1
    ours = extract_features(mono, spec.sample_rate, num_coeffs=num_coeffs,
                            fft_size=fft_size, fft_overlap=2)

    n = min(ours.shape[1], ref.shape[1])
    ours, ref = ours[:, :n], ref[:, :n]
    print(f"frames compared: {n}  channels: {ref.shape[0]}")

    print(f"{'ch':>3} {'corr':>7} {'scale':>9} {'offset':>9} {'rms resid':>10}")
    for ch in range(ref.shape[0]):
        x, y = ours[ch].astype(np.float64), ref[ch].astype(np.float64)
        if np.std(x) == 0:
            print(f"{ch:>3} degenerate (constant output)")
            continue
        corr = float(np.corrcoef(x, y)[0, 1])
        a, b = np.polyfit(x, y, 1)
        resid = y - (a * x + b)
        print(f"{ch:>3} {corr:7.4f} {a:9.4f} {b:9.4f} "
              f"{float(np.sqrt((resid ** 2).mean())):10.5f}")

    print("\nInterpretation: corr ≈ 1 with any scale/offset ⇒ analyses agree")
    print("(normalization + Pearson correlation are affine-invariant).")
    print("Fold channel-1.. scale/offset into MFCC_SCALE/MFCC_OFFSET and the")
    print("channel-0 fit into FULL_SCALE_DB in")
    print("strugatzki_tpu/dsp/constants.py, then iterate on the residuals")
    print("(contour values, log floor, masking forms \u2014 the C-graded")
    print("items in docs/ML_DERIVATION.md).")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2])
