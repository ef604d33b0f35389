"""In-context A/B of the query kernel's selection epilogue: the full trace
body feeding (a) the production ``lax.top_k``, (b) a k-pass iterative
masked-argmax, (c) a hierarchical block-max → gather → small top_k.  All
three are exact with identical tie order; tools/query_decomp.py showed the
epilogue costs ~25 ms of the 95 ms chunk, and standalone probes are
dispatch-RTT noise, so the comparison must run fused after the real trace.

    python tools/topk_incontext.py [n_files]
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


def trace_all(x_re, x_im, xs_b, shifts):
    def one(re, im, xs_row, sh):
        X, aux, use_sums = D._unpack_if_reduced((re, im), xs_row, nt)
        return D._trace_any(
            X, aux, use_sums, Tp, *targs, sh, jnp.float32(0.5),
            jnp.float32(8.0), num_temporal=nt)
    return D._chunked_files_vmap(one, (x_re, x_im, xs_b, shifts), 1)


def masked_sims(x_re, x_im, xs_b, shifts, lens):
    sims, boosts = trace_all(x_re, x_im, xs_b, shifts)
    w_valid = (lens - (punch - 1)).reshape(-1, 1)
    masked = jnp.where(jnp.arange(sims.shape[-1]) < w_valid, sims, -jnp.inf)
    return masked, boosts


@jax.jit
def sel_lax(x_re, x_im, xs_b, shifts, lens):
    masked, boosts = masked_sims(x_re, x_im, xs_b, shifts, lens)
    vals, idx = jax.lax.top_k(masked, k)
    return vals, idx, jnp.take_along_axis(boosts, idx, axis=-1)


@jax.jit
def sel_iter(x_re, x_im, xs_b, shifts, lens):
    masked, boosts = masked_sims(x_re, x_im, xs_b, shifts, lens)
    t_idx = jnp.arange(masked.shape[-1], dtype=jnp.int32)

    def step(arr, _):
        v = arr.max(axis=-1)
        i = arr.argmax(axis=-1).astype(jnp.int32)
        arr = jnp.where(t_idx == i[..., None], -jnp.inf, arr)
        return arr, (v, i)

    _, (vals, idx) = jax.lax.scan(step, masked, None, length=k)
    vals, idx = jnp.moveaxis(vals, 0, -1), jnp.moveaxis(idx, 0, -1)
    return vals, idx, jnp.take_along_axis(boosts, idx, axis=-1)


S = 128


@jax.jit
def sel_block(x_re, x_im, xs_b, shifts, lens):
    masked, boosts = masked_sims(x_re, x_im, xs_b, shifts, lens)
    Bn, Wn = masked.shape
    G = -(-Wn // S)
    xp = jnp.pad(masked, ((0, 0), (0, G * S - Wn)),
                 constant_values=-jnp.inf)
    bm = xp.reshape(Bn, G, S).max(axis=-1)
    _, blk = jax.lax.top_k(bm, k)
    blk = jnp.sort(blk, axis=-1)
    cols = (blk[..., None] * S + jnp.arange(S)).reshape(Bn, k * S)
    cand = jnp.take_along_axis(xp, cols, axis=-1)
    vals, pos = jax.lax.top_k(cand, k)
    idx = jnp.take_along_axis(cols, pos, axis=-1)
    return vals, idx, jnp.take_along_axis(boosts, idx, axis=-1)


@jax.jit
def sel_none(x_re, x_im, xs_b, shifts, lens):
    masked, boosts = masked_sims(x_re, x_im, xs_b, shifts, lens)
    return masked.sum() + boosts.sum()


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


A = (db._spectra[0], db._spectra[1], db._xs, db._shifts, db._lens_dev)
_, t0n = timeit("no selection", sel_none, *A)
(rv, ri, rb), t_l = timeit("lax.top_k", sel_lax, *A)
(iv, ii, ib), t_i = timeit("iterative argmax", sel_iter, *A)
(bv, bi, bb), t_b = timeit("block hierarchical", sel_block, *A)
print(f"epilogue cost: lax {1e3*(t_l-t0n):.1f} iter {1e3*(t_i-t0n):.1f} "
      f"block {1e3*(t_b-t0n):.1f} ms", flush=True)
print("iter  equal:", bool((rv == iv).all() and (ri == ii).all()
                           and (rb == ib).all()), flush=True)
print("block equal:", bool((rv == bv).all() and (ri == bi).all()
                           and (rb == bb).all()), flush=True)
