"""CPU↔TPU numerical parity battery (SURVEY §4(e): hardware-parity tests
replace the reference's nonexistent numerical tests).

Runs the extraction front-end, a correlation trace, and a self-similarity
gram block on the real attached chip and compares against (a) the same
pipeline on the CPU backend (subprocess) and (b) the float64 mirror of the
reference math where one exists.  Prints per-surface max-abs errors and a
PASS/FAIL verdict against the budgets docs/PARITY.md records.

    python tools/tpu_parity.py
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CPU_CHILD = r"""
import sys
import numpy as np
sys.path.insert(0, sys.argv[1])
from strugatzki_tpu.dsp.frontend import extract_features
rng = np.random.default_rng(42)
sr = 44100.0
t = np.arange(int(3 * sr)) / sr
x = (0.2 * rng.standard_normal(t.size)
     + 0.3 * np.sin(2 * np.pi * 220 * t)
     + 0.1 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
np.savez(sys.argv[2], feats=extract_features(x, sr), x=x)
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # --- CPU half in a subprocess (the platform is fixed per process) -------
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "cpu.npz")
        env = dict(os.environ, STRUGATZKI_PLATFORM="cpu", JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, "-c", _CPU_CHILD, repo, out],
                       env=env, check=True)
        z = np.load(out)
        feats_cpu, x = z["feats"], z["x"]

    import jax.numpy as jnp

    from strugatzki_tpu.dsp.frontend import extract_features
    from strugatzki_tpu.analysis.correlation import InputTemplate
    from strugatzki_tpu.kernels import corr as K
    from strugatzki_tpu.kernels import mathref as M

    import jax
    print(f"device: {jax.devices()[0]}")

    failures = []

    def check(name, err, budget):
        ok = err <= budget
        print(f"  {name:44s} max|Δ| = {err:.3e}  budget {budget:g}  "
              f"{'PASS' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)

    # 1. extraction front-end: TPU vs CPU
    feats_tpu = extract_features(x, 44100.0)
    print("extraction (3 s mixed tones+noise, 14×257 features):")
    check("loudness row TPU vs CPU",
          float(np.abs(feats_tpu[0] - feats_cpu[0]).max()), 2e-4)
    check("MFCC rows TPU vs CPU",
          float(np.abs(feats_tpu[1:] - feats_cpu[1:]).max()), 2e-4)

    # 2. correlation trace: TPU vs the f64 mirror of the reference math
    rng = np.random.default_rng(1)
    feats = np.abs(0.5 + 0.1 * rng.standard_normal((14, 400))).astype(np.float32)
    tmpl = InputTemplate(feats[:, 50:110].copy())
    xs, sh_t, _ = K.shift_per_group(feats)
    sims, boosts = K.correlation_trace(
        jnp.asarray(xs), tmpl.device_temporal(), tmpl.device_spectral(),
        jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
        jnp.float32(tmpl.ln_avg_loudness), jnp.float32(sh_t),
        jnp.float32(0.5), jnp.float32(8.0))
    sims = np.asarray(sims)[:400 - 60 + 1]

    block = feats.copy()
    ref = np.empty_like(sims)
    L = 60
    for t in range(len(sims)):
        win = block[:, t:t + L]
        bm_t, bs_t = M.stat(win, 0, L, 0, 1)
        bm_s, bs_s = M.stat(win, 0, L, 1, 13)
        c_t = M.correlate(tmpl.temporal_centered + np.float32(tmpl.temporal_mean),
                          tmpl.temporal_mean, tmpl.temporal_std, L, 1,
                          win, bm_t, bs_t, 0, 0)
        c_s = M.correlate(tmpl.spectral_centered + np.float32(tmpl.spectral_mean),
                          tmpl.spectral_mean, tmpl.spectral_std, L, 13,
                          win, bm_s, bs_s, 0, 1)
        with np.errstate(divide="ignore"):
            boost = np.exp((tmpl.ln_avg_loudness
                            - np.log(np.float64(M.avg(win[0], 0, L)))) / 0.6)
        ref[t] = (0.5 * c_t + 0.5 * c_s) if boost <= 8.0 else 0.0
    print("correlation trace (341 windows) vs f64 mirror:")
    check("sim trace TPU vs mirror", float(np.abs(sims - ref).max()), 1e-5)

    # 2b. novelty trace (segmentation) vs mirror
    xs_j = jnp.asarray(xs)
    h = 20
    nov = np.asarray(K.novelty_trace(xs_j, h, jnp.float32(0.5)))
    W_n = feats.shape[1] - 2 * h + 1
    ref_n = np.empty(W_n, np.float32)
    for t in range(W_n):
        buf = feats[:, t:t + 2 * h]
        ref_n[t] = (0.5 * M.correlate_half(1, h, buf, 0, 0)
                    + 0.5 * M.correlate_half(13, h, buf, 0, 1))
    print("novelty trace (segmentation) vs f64 mirror:")
    check("novelty TPU vs mirror", float(np.abs(nov[:W_n] - ref_n).max()),
          1e-5)

    # 3. gram similarity block vs mirror (self-similarity cells)
    win_starts = np.arange(64, dtype=np.int64)
    w = K.extract_windows(jnp.asarray(xs), jnp.asarray(win_starts), 30)
    st = K.window_stats(w)
    g = np.asarray(K.gram_similarity_block(w, w, st, st, jnp.float32(0.5)))
    ref_g = np.empty_like(g)
    for i in range(64):
        for j in range(64):
            buf = np.concatenate([feats[:, i:i + 30], feats[:, j:j + 30]],
                                 axis=1)
            c_t = M.correlate_half(1, 30, buf, 0, 0)
            c_s = M.correlate_half(13, 30, buf, 0, 1)
            ref_g[i, j] = 0.5 * c_t + 0.5 * c_s
    print("gram block (64×64 cells) vs f64 mirror:")
    check("gram sims TPU vs mirror", float(np.abs(g - ref_g).max()), 1e-5)

    # 3b. fast-engine pair program (round 4: resident stacks + in-jit
    # gather) on chip: must match the direct block kernel bit-for-bit and
    # the mirror within budget
    from strugatzki_tpu.analysis import self_similarity as SS
    n_fast, _nb, res1, res2 = SS._prep_resident(xs, xs, 30, 1)
    pairs = [(0, 0)] * SS._PAIRS_PER_CALL
    fast = np.asarray(SS._dispatch_pairs_fast(res1, res2, pairs,
                                              jnp.float32(0.5)))[0]
    print("fast-engine pair call (block 0 × block 0) on chip:")
    check("fast engine vs mirror",
          float(np.abs(fast[:64, :64] - ref_g).max()), 1e-5)
    # informational: different compiled programs may FMA-contract
    # differently (a few ulp), so bitwise agreement is reported, not
    # required — the mirror budget above is the correctness bar
    ulp = float(np.abs(fast[:64, :64] - g).max())
    bit_equal = np.array_equal(fast[:64, :64], g, equal_nan=True)
    print(f"  {'fast engine vs direct block kernel':44s} "
          + ("bit-equal" if bit_equal else f"max|Δ| = {ulp:.3e} "
             "(cross-program FMA-contraction scatter)"))

    if failures:
        print(f"\nFAIL: {failures}")
        sys.exit(1)
    print("\nall parity budgets PASS on this chip")


if __name__ == "__main__":
    main()
