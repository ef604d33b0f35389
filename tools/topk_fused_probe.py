"""A/B the production query kernel against a variant whose per-file top-k
runs INSIDE the chunked files step (`lax.map` emits [bc, k] instead of the
full [bc, W] sims row), eliminating the 78 MB/chunk HBM round-trip of the
materialized sims that tools/topk_incontext.py measured at ~70 ms.  Same
values, same tie order (per-file top_k is unchanged; only where it runs
moves).

    python tools/topk_fused_probe.py [n_files]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel import database as D

n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
file_frames, punch, k = 10336, 861, 16
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]
tmpl = InputTemplate(feats[min(77, n_files - 1)][:, 100:100 + punch].copy())

t0 = time.perf_counter()
db = D.FeatureDatabase(entries, norm=None, cache_spectra="bf16")
print(f"staged {n_files} in {time.perf_counter()-t0:.0f}s",
      file=sys.stderr, flush=True)
Tp = db._xs.shape[2]
nt = db._num_temporal
targs = (tmpl.device_temporal(), tmpl.device_spectral(),
         jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
         jnp.float32(tmpl.ln_avg_loudness))


@jax.jit
def fused_topk(x_re, x_im, xs_b, shifts, lens):
    t_idx = jnp.arange(Tp - punch + 1)

    def one(re, im, xs_row, sh, ln):
        X, aux, use_sums = D._unpack_if_reduced((re, im), xs_row, nt)
        sims, boosts = D._trace_any(
            X, aux, use_sums, Tp, *targs, sh, jnp.float32(0.5),
            jnp.float32(8.0), num_temporal=nt)
        masked = jnp.where(t_idx < ln - (punch - 1), sims, -jnp.inf)
        vals, idx = jax.lax.top_k(masked, k)
        return vals, idx, jnp.take_along_axis(boosts, idx, axis=-1)

    return D._chunked_files_vmap(
        one, (x_re, x_im, xs_b, shifts, lens), 1)


def timeit(name, f, *args, reps=5):
    t0 = time.perf_counter()
    out = jax.tree_util.tree_map(np.asarray, f(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:22s} best {min(ts)*1e3:7.1f} ms (compile {c:.0f}s)",
          flush=True)
    return out, min(ts)


def prod():
    r = db.query(tmpl, k=k, exact_rerank=False)
    return np.asarray(r.sims), np.asarray(r.frames), np.asarray(r.boosts)


(pv, pi, pb), t_p = timeit("production db.query", prod)
A = (db._spectra[0], db._spectra[1], db._xs, db._shifts, db._lens_dev)
(fv, fi, fb), t_f = timeit("fused per-file top-k", fused_topk, *A)
fin = np.isfinite(pv)
print("vals equal:", bool(np.array_equal(pv[fin], np.asarray(fv)[fin])),
      " idx equal:", bool(np.array_equal(pi[fin], np.asarray(fi)[fin])),
      f"  speedup x{t_p / t_f:.2f}", flush=True)
