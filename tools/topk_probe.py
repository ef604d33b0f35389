"""A/B the per-file top-k epilogue on hardware: ``lax.top_k`` (sort-based,
~25 ms per 2048-file chunk in tools/query_decomp.py) vs an iterative
masked-argmax (k passes of max+argmax, ~k*2 full-array HBM sweeps).  Both
are exact with identical tie order (lowest index first), so values/indices
must be bit-equal.

    python tools/topk_probe.py [B] [W] [k]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
W = int(sys.argv[2]) if len(sys.argv) > 2 else 9476
k = int(sys.argv[3]) if len(sys.argv) > 3 else 16

rng = np.random.default_rng(0)
sims = rng.standard_normal((B, W)).astype(np.float32)
# plant ties to exercise tie order
sims[:, 5] = sims[:, 7] = 3.0


@jax.jit
def ref_topk(x):
    return jax.lax.top_k(x, k)


@jax.jit
def iter_topk(x):
    t_idx = jnp.arange(x.shape[-1], dtype=jnp.int32)

    def step(arr, _):
        v = arr.max(axis=-1)
        i = arr.argmax(axis=-1).astype(jnp.int32)
        arr = jnp.where(t_idx == i[..., None], -jnp.inf, arr)
        return arr, (v, i)

    _, (vals, idx) = jax.lax.scan(step, x, None, length=k)
    return jnp.moveaxis(vals, 0, -1), jnp.moveaxis(idx, 0, -1)


S = 128  # block size for the hierarchical variant


@jax.jit
def block_topk(x):
    Bn, Wn = x.shape
    G = -(-Wn // S)
    pad = G * S - Wn
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    bm = xp.reshape(Bn, G, S).max(axis=-1)            # one full pass
    _, blk = jax.lax.top_k(bm, k)                     # [B, k] tiny
    blk = jnp.sort(blk, axis=-1)                      # ascending → stable ties
    cols = blk[..., None] * S + jnp.arange(S)         # [B, k, S]
    cand = jnp.take_along_axis(xp, cols.reshape(Bn, k * S), axis=-1)
    vals, pos = jax.lax.top_k(cand, k)
    idx = jnp.take_along_axis(cols.reshape(Bn, k * S), pos, axis=-1)
    return vals, idx


def timeit(name, f, x, reps=5):
    x = jnp.asarray(x)
    out = jax.tree_util.tree_map(np.asarray, f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, f(x))
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} best {min(ts)*1e3:7.1f} ms", flush=True)
    return out, min(ts)


(rv, ri), t_ref = timeit("lax.top_k", ref_topk, sims)
(iv, ii), t_it = timeit("iterative argmax", iter_topk, sims)
(bv, bi), t_bl = timeit("block-hierarchical", block_topk, sims)
print("iter  vals equal:", bool((rv == iv).all()),
      " idx equal:", bool((ri == ii).all()),
      f"  speedup x{t_ref / t_it:.2f}", flush=True)
print("block vals equal:", bool((rv == bv).all()),
      " idx equal:", bool((ri == bi).all()),
      f"  speedup x{t_ref / t_bl:.2f}", flush=True)
