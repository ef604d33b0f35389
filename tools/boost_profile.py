"""Replicate the reference author's boost-estimator experiment
(notes/BoostFactor.txt) against OUR Loudness transcription.

The note measures, with the real scsynth Loudness UGen, the error of
``boost = exp(Δln/0.6)`` when a sine is attenuated by 0.5 — at nine
frequencies.  Running the identical experiment against this framework's
transcription calibrates the reconstruction empirically:

    python tools/boost_profile.py

Interpretation (docs/ML_DERIVATION.md): the error at frequency f is set by
the local equal-loudness contour slope s = Δphon/ΔdB there
(err = 2^(1−s) − 1 for a 0.5 attenuation), so matching error magnitudes
mean matching contour slopes.  Round 2 showed the ISO-2003 rebuild lacks
the UGen's 28–30% bump at 3–4 kHz (⇒ ML.cpp tabulates pre-2003 data);
round 3's default ``rd1987`` contour model fits the pre-2003 analytic form
to these anchors (tools/fit_contours.py) and reproduces all nine within
0.3 points.  This tool re-measures the profile against whatever contour
source is active (fit / iso2003 / verbatim drop-in).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

#: (frequency Hz -> % error) measured by the reference author with the
#: real UGen (notes/BoostFactor.txt:20-29; sign not recorded)
SCSYNTH = {200: 20, 300: 10, 400: 2.4, 1000: 0, 2000: 10, 3000: 30,
           4000: 28, 5000: 3, 10000: 5}


def main() -> None:
    # the one measurement definition lives in fit_contours.measure — the
    # fitter and this profiler must measure the same experiment
    from fit_contours import measure

    freqs = list(SCSYNTH)
    errs = measure(freqs)
    print(f"{'freq':>6} {'ours err%':>10} {'scsynth |err|%':>15}")
    for f, err in zip(freqs, errs):
        print(f"{f:>6} {err:>10.1f} {SCSYNTH[f]:>15}")


if __name__ == "__main__":
    main()
