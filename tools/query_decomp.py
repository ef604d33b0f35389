"""Decompose the compact query's device time: the 10k capture is ~350 ms
device-only — is it the 2 template-dot irffts, the on-the-fly window-sum
cumsum tables, or dispatch overhead?  Stages a 2048-file compact DB (one
production chunk; timings scale ~linearly in files) and times jitted
slices of the per-file trace body against the full kernel.

    python tools/query_decomp.py [n_files]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.parallel import database as D

n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
file_frames, punch = 10336, 861
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


def timeit(name, f, *args, reps=4):
    t0 = time.perf_counter()
    jax.tree_util.tree_map(np.asarray, f(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} best {min(ts)*1e3:7.1f} ms (compile {compile_s:.0f}s)",
          flush=True)
    return min(ts)


def chunked(fn, mapped, lanes=1):
    return D._chunked_files_vmap(fn, mapped, lanes)


# 0. full production kernel (query path, k=16)
t_full = timeit("full query kernel (k=16)",
                lambda: db.query(tmpl, k=16, exact_rerank=False))

# 1. sums tables + window stats only (no irfft)
@jax.jit
def tables_only(xs_b):
    def one(xs_row):
        sums = K.window_sum_table(xs_row, nt)
        L = punch
        W = Tp - L + 1
        s_t = sums[0, L:L + W] - sums[0, :W]
        q_t = sums[1, L:L + W] - sums[1, :W]
        s_s = sums[2, L:L + W] - sums[2, :W]
        q_s = sums[3, L:L + W] - sums[3, :W]
        return (s_t * q_t + s_s * q_s).sum()
    return chunked(one, (xs_b,))


t_tab = timeit("window-sum tables + stats only", tables_only, db._xs)

# 2. upcast + the 2 template-dot irffts only (no stats)
@partial(jax.jit, static_argnames=())
def irffts_only(x_re, x_im, tt, ts):
    N = K._fft_len(Tp)
    tf_t = jnp.conj(jnp.fft.rfft(tt, n=N, axis=1)).sum(axis=0)
    tf_s = jnp.conj(jnp.fft.rfft(ts, n=N, axis=1)).sum(axis=0)

    def one(re, im):
        X = K.unpack_spectra(re, im)
        d_t = jnp.fft.irfft((X[:nt] * tf_t).sum(axis=0), n=N)
        d_s = jnp.fft.irfft((X[nt:] * tf_s).sum(axis=0), n=N)
        return (d_t + d_s).sum()
    return chunked(one, (x_re, x_im))


t_fft = timeit("upcast + 2 template-dot irffts",
               irffts_only, db._spectra[0], db._spectra[1], *targs[:2])

# 2b. full trace body, NO top-k (dense sims reduced to a scalar)
@jax.jit
def trace_no_topk(x_re, x_im, xs_b, shifts):
    def one(re, im, xs_row, sh):
        X, aux, use_sums = D._unpack_if_reduced((re, im), xs_row, nt)
        sims, boosts = D._trace_any(
            X, aux, use_sums, Tp, *targs, sh, jnp.float32(0.5),
            jnp.float32(8.0), num_temporal=nt)
        return sims.sum() + boosts.sum()
    return chunked(one, (x_re, x_im, xs_b, shifts))


t_tr = timeit("full trace body, no top-k",
              trace_no_topk, db._spectra[0], db._spectra[1], db._xs,
              db._shifts)

# 2c. trace + approx_max_k instead of exact top_k
@jax.jit
def trace_approx_topk(x_re, x_im, xs_b, shifts, lens):
    def one(re, im, xs_row, sh):
        X, aux, use_sums = D._unpack_if_reduced((re, im), xs_row, nt)
        return D._trace_any(
            X, aux, use_sums, Tp, *targs, sh, jnp.float32(0.5),
            jnp.float32(8.0), num_temporal=nt)
    sims, boosts = chunked(one, (x_re, x_im, xs_b, shifts))
    L = punch
    w_valid = (lens - (L - 1)).reshape(-1, 1)
    masked = jnp.where(jnp.arange(sims.shape[-1]) < w_valid, sims, -jnp.inf)
    vals, idx = jax.lax.approx_max_k(masked, 16)
    return vals, idx, jnp.take_along_axis(boosts, idx, axis=-1)


try:
    t_ap = timeit("trace + approx_max_k(16)",
                  trace_approx_topk, db._spectra[0], db._spectra[1],
                  db._xs, db._shifts, db._lens_dev)
except Exception as e:
    print(f"approx_max_k FAILED: {type(e).__name__}: "
          f"{str(e).splitlines()[0][:90]}", flush=True)

# 3. dispatch floor: trivial reduce over the same operands
@jax.jit
def touch(x_re, xs_b):
    def one(re, xs_row):
        return re[0, 0].astype(jnp.float32) + xs_row[0, 0]
    return chunked(one, (x_re, xs_b))


t_d = timeit("dispatch floor (trivial reduce)", touch, db._spectra[0], db._xs)

print(f"\nshares of full {t_full*1e3:.0f} ms: tables {t_tab*1e3:.0f}, "
      f"irffts {t_fft*1e3:.0f}, dispatch {t_d*1e3:.0f}, "
      f"other(topk/blend/fetch) {max(0.0, t_full-t_tab-t_fft-t_d)*1e3:.0f}",
      flush=True)
