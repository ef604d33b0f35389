"""Fit the pre-2003 contour slope trims to the reference's measured
boost-error anchors, through the real extraction pipeline.

The rd1987 contour reconstruction (dsp/ml_tables.py) targets, per anchor
frequency, the secant slope implied by the reference author's measured
boost error (notes/BoostFactor.txt:20-29 via err = 2^(1−s) − 1).  The
realized error differs slightly from the target because band tables are
built at band *centres* (not the test frequencies), the analytic curve is
sampled at 11 phon knots, and the window leaks energy across band edges.
This tool closes the loop: it runs the author's actual experiment against
the pipeline, converts each residual into a slope correction, updates
``ml_tables._RD_SLOPE_TRIM``, and iterates to a fixed point.  The final
trims are frozen as literals in ml_tables.py (run with ``--print`` to get
the line).

    STRUGATZKI_PLATFORM=cpu python tools/fit_contours.py [--rounds N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(freqs) -> np.ndarray:
    """Signed boost error (%) at each frequency, through the pipeline."""
    from strugatzki_tpu.dsp.frontend import extract_features
    sr = 44100.0
    t = np.arange(int(sr)) / sr
    errs = []
    for f in freqs:
        x1 = np.sin(2 * np.pi * f * t).astype(np.float32)
        l1 = extract_features(x1, sr)[0, 20:-20].mean()
        l2 = extract_features((0.5 * x1).astype(np.float32), sr)[0, 20:-20].mean()
        loss = np.exp((np.log(l2) - np.log(l1)) / 0.6)
        errs.append((loss - 0.5) * 100 / 0.5)
    return np.array(errs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--damping", type=float, default=0.8)
    args = ap.parse_args()

    from strugatzki_tpu.dsp import ml_tables as T

    freqs = T._RD_ANCHORS_HZ
    target = T._RD_ANCHOR_ERR
    s_ref = 1.0 - np.log2(1.0 + target / 100.0)

    for rnd in range(args.rounds):
        errs = measure(freqs)
        resid = errs - target
        print(f"round {rnd}: err = {np.round(errs, 1)}", file=sys.stderr)
        print(f"         resid = {np.round(resid, 1)}  "
              f"max|resid| = {np.abs(resid).max():.2f}", file=sys.stderr)
        if np.abs(resid).max() < 0.5:
            break
        s_meas = 1.0 - np.log2(1.0 + np.clip(errs, -95, None) / 100.0)
        T._RD_SLOPE_TRIM += args.damping * (s_ref - s_meas)
        T.set_contour_model(T._CONTOUR_MODEL)   # invalidate cached tables

    print("# frozen trims for ml_tables._RD_SLOPE_TRIM:")
    print("_RD_SLOPE_TRIM = np.array(")
    vals = ", ".join(f"{v:.6f}" for v in T._RD_SLOPE_TRIM)
    print(f"    [{vals}])")


if __name__ == "__main__":
    main()
