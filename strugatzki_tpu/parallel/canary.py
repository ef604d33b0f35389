"""Standing planted-match canary for the batched serving kernels.

Round 4 found a TPU-backend fault: queries-axis-vmapped batched trace
programs return silently DEFLATED sims (planted exact matches came back
0.88–0.99, bit-identical across kernel structures) whenever a fused step
holds a power-of-two ≥ 2048 trace lanes (docs/ROUND4_NOTES.md; CLAUDE.md).
The mitigation chunks the files axis to the hardware-validated ≤ 1024
lanes per fused step (:func:`.database._chunked_files_vmap`) — but the
fault is invisible on CPU, and a backend/XLA update could silently
re-introduce value deflation inside the validated regime without any test
noticing.  This module is the standing detector: it plants exact matches
(the reference's own ``correlate(a, a) == 1`` guarantee,
impl/MathUtil.scala:195) and pushes them through the PRODUCTION batched
query and punch kernels at a downscaled shape that sits exactly at the
validated per-step lane budget, asserting every planted sim returns 1.0.

Run it every hardware session::

    python tools/batch_canary.py          # exits non-zero on FAIL

``bench.py`` also runs it after printing the driver's JSON line (env
``BENCH_CANARY=0`` skips), so every captured BENCH record carries a fresh
canary verdict in its stderr tail.

The shapes are chosen so both batched kernels take the CHUNKED path at
precisely the validated budget boundary:

* query: Q=8 templates → ``bc = 1024/8 = 128`` files per step over
  B=256 files (2 chunks), 8·128 = 1024 trace lanes per fused step;
* punch: 2·Q=16 lanes/file → ``bc = 64`` (4 chunks), 16·64 = 1024 lanes.

A deflation recurrence shows up as ``|sim − 1| ≳ 1e-2`` (the observed
fault scale); FFT-formulation rounding is ≤ 3e-8 on hardware
(docs/BENCHMARKS.md), so the 1e-4 verdict threshold separates the two by
two orders of magnitude in each direction.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["run_batch_canary", "format_report"]

#: FAIL when any planted sim deviates from 1.0 by more than this.  The
#: fault deflates by ≥ 1e-2; kernel rounding is ≤ 3e-8 — see module doc.
TOLERANCE = 1e-4

#: Tolerance for the RAW device sims of the reduced (compact) spectra
#: cache with the exact re-rank disabled: bf16 spectra quantization puts
#: ~1e-3 noise on the trace, still an order below the ≥ 1e-2 deflation
#: fault.  (The re-ranked results are held to :data:`TOLERANCE`.)
REDUCED_TOLERANCE = 4e-3


def run_batch_canary(n_files: int = 256, file_frames: int = 1200,
                     num_queries: int = 8, l_in: int = 96, l_out: int = 48,
                     seed: int = 0, cache_spectra=False,
                     mesh=None) -> dict:
    """Plant exact matches, run the production batched kernels, report.

    Returns a dict: ``pass`` (bool), ``worst`` (max ``|sim − 1|`` over
    every planted hit across all four kernel families), per-family worsts,
    and ``frames_ok`` (every planted hit surfaced at its planted offset).
    Pure function of ``seed`` — no files touched, ~40 MB of synthetic
    features staged.
    """
    from ..analysis.correlation import InputTemplate
    from .database import FeatureDatabase

    rng = np.random.default_rng(seed)
    base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
    feats = np.abs(base + 0.1 * rng.standard_normal(
        (n_files, 14, file_frames)).astype(np.float32))
    entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]

    # plant query templates and punch pairs in distinct, non-adjacent files
    # spread across the chunk boundaries (file q·stride), each at a
    # query-distinct offset so a frame collision can't mask a wrong index
    stride = max(1, n_files // max(1, num_queries) - 1)
    o_in = 100
    o_out = o_in + 2 * l_in + 200              # punch distance D = o_out−o_in
    d_punch = o_out - o_in
    min_punch, max_punch = d_punch - 50, d_punch + 50
    if o_out + l_out + num_queries >= file_frames:
        raise ValueError("file_frames too short for the planted layout")
    tmpls, pairs, planted = [], [], []
    for q in range(num_queries):
        f = (q * stride + 1) % n_files
        src = feats[f]
        tmpls.append(InputTemplate(src[:, o_in + q:o_in + q + l_in].copy()))
        pairs.append((tmpls[-1],
                      InputTemplate(src[:, o_out + q:o_out + q + l_out]
                                    .copy()),
                      min_punch, max_punch))
        planted.append((f, o_in + q))

    db = FeatureDatabase(entries, norm=None, cache_spectra=cache_spectra,
                         mesh=mesh)
    report = {"families": {}, "tols": {}, "frames_ok": True}

    def record(name: str, devs, frames_ok: bool,
               tol: float = TOLERANCE) -> None:
        report["families"][name] = float(np.max(devs))
        report["tols"][name] = tol
        report["frames_ok"] = report["frames_ok"] and frames_ok

    def run_families(suffix: str = "", tol: float = TOLERANCE,
                     **kw) -> None:
        # -- batched query (the invalidated round-3 path, now chunked) -----
        qb = db.query_batch(tmpls, k=2, **kw)
        devs, f_ok = [], True
        for q, (f, off) in enumerate(planted):
            devs.append(abs(float(qb[q].sims[f, 0]) - 1.0))
            f_ok &= int(qb[q].frames[f, 0]) == off
        record("query_batch" + suffix, devs, f_ok, tol)

        # -- batched punch (2·Q lanes per file — the harder regime) --------
        pb = db.query_punch_batch(pairs, k=2, **kw)
        devs, f_ok = [], True
        for q, (f, off) in enumerate(planted):
            devs.append(abs(float(pb[q].sims[f, 0]) - 1.0))
            # punch_lens is the matched length − min_punch
            f_ok &= (int(pb[q].frames[f, 0]) == off
                     and min_punch + int(pb[q].punch_lens[f, 0]) == d_punch)
        record("query_punch_batch" + suffix, devs, f_ok, tol)

        # -- Q=1 serving kernels (absolute ground truth for the same DB) ---
        sq = db.query(tmpls[0], k=2, **kw)
        f0, off0 = planted[0]
        record("query" + suffix, [abs(float(sq.sims[f0, 0]) - 1.0)],
               int(sq.frames[f0, 0]) == off0, tol)
        sp = db.query_punch(pairs[0][0], pairs[0][1], min_punch=min_punch,
                            max_punch=max_punch, k=2, **kw)
        record("query_punch" + suffix, [abs(float(sp.sims[f0, 0]) - 1.0)],
               int(sp.frames[f0, 0]) == off0
               and min_punch + int(sp.punch_lens[f0, 0]) == d_punch, tol)

    run_families()
    if db._spectra_reduced:
        # Reduced (compact) cache: the default runs above went through the
        # exact re-rank (sims restored to rounding level, tol 1e-4) —
        # which would mask a UNIFORM trace deflation, since deflated-but-
        # correctly-ranked candidates re-rank to exact 1.0.  So also check
        # the raw device trace sims (re-rank off) at the reduced tolerance:
        # bf16 spectra quantization is ~1e-3, the fault deflates ≥ 1e-2.
        run_families(suffix="[raw]", tol=REDUCED_TOLERANCE,
                     exact_rerank=False)

    report["worst"] = max(report["families"].values())
    report["pass"] = bool(report["frames_ok"] and all(
        report["families"][k] <= report["tols"][k]
        for k in report["families"]))
    return report


def format_report(report: dict) -> str:
    """One status line: ``batch-kernel canary: PASS/FAIL ...``."""
    tols = report.get("tols", {})
    fams = ", ".join(f"{k} |Δ|={v:.2e}"
                     for k, v in sorted(report["families"].items()))
    verdict = "PASS" if report["pass"] else "FAIL"
    extra = "" if report["frames_ok"] else "; PLANTED FRAMES WRONG"
    raw_tols = sorted({t for k, t in tols.items() if k.endswith("[raw]")})
    raw = f"; raw tol {raw_tols[0]:g}" if raw_tols else ""
    return (f"batch-kernel canary: {verdict} worst |sim-1|="
            f"{report['worst']:.2e} (tol {TOLERANCE:g}{raw}) [{fams}]"
            f"{extra}")
