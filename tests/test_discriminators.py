"""Self-validation of the C-grade-constant discriminators
(tools/discriminate_constants.py): for every hypothesis axis, extract the
probe under a flipped candidate, hand that to the decision procedure as a
stand-in "reference" file, and assert the tool recovers the flip — proving
the probe + affine-invariant scorer genuinely separate the candidates
before any real reference-extracted file exists."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import discriminate_constants as DC  # noqa: E402

from strugatzki_tpu.dsp import constants as C  # noqa: E402
from strugatzki_tpu.dsp.frontend import extract_features  # noqa: E402


@pytest.fixture(scope="module")
def probe():
    return DC.make_probe()


def _extract_under(audio, **hyp):
    defaults = {name: getattr(C, name) for name in C.HYPOTHESES}
    defaults["MEL_LOG_FLOOR"] = C.MEL_LOG_FLOOR
    defaults["FULL_SCALE_DB"] = C.FULL_SCALE_DB
    C.set_hypothesis(**{**defaults, **hyp})
    try:
        return np.asarray(extract_features(audio, DC.SR))
    finally:
        C.set_hypothesis(**defaults)


@pytest.mark.parametrize("axis,flipped", [
    ("MEL_BAND_INPUT", "magnitude"),
    ("SMASK_FORM", "factor_intensity"),
    ("TMASK_FORM", "feedback"),
    ("MEL_LOG_FLOOR", 1e-6),
    ("FULL_SCALE_DB", 96.0),
])
def test_discriminator_recovers_flipped_hypothesis(probe, axis, flipped):
    fake_ref = _extract_under(probe, **{axis: flipped})
    decisions = DC.decide(probe, fake_ref, out=open(os.devnull, "w"))
    assert decisions[axis][0] == flipped, decisions[axis]


def test_discriminator_confirms_defaults(probe):
    """With the shipped defaults as the reference, every axis must decide
    the shipped value (no false flips)."""
    fake_ref = _extract_under(probe)
    decisions = DC.decide(probe, fake_ref, out=open(os.devnull, "w"))
    assert decisions["MEL_BAND_INPUT"][0] == "power"
    assert decisions["SMASK_FORM"][0] == "factor_db"
    assert decisions["TMASK_FORM"][0] == "prev_frame"
    assert decisions["MEL_LOG_FLOOR"][0] == 1e-10
    assert decisions["FULL_SCALE_DB"][0] == 90.0


def test_probe_is_deterministic_and_writable(tmp_path):
    from strugatzki_tpu.io import audiofile as af
    from strugatzki_tpu.io.formats import AIFF
    p1, p2 = DC.make_probe(), DC.make_probe()
    np.testing.assert_array_equal(p1, p2)
    out = tmp_path / "probe.aif"
    af.write(out, p1[None],
             af.AudioFileSpec(AIFF, af.SampleFormat.FLOAT, 1, DC.SR))
    back, spec = af.read(out)
    np.testing.assert_array_equal(back[0], p1)
