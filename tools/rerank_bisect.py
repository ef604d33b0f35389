"""Characterize the device re-rank fault (tools/rerank_repro.py found
planted-match deflation at M >= 1024 candidate windows on the current
backend): bisect the failing M, check whether the error is a uniform
multiplicative deflation, isolate the vmapped dynamic_slice GATHER from
the scoring math, and A/B an in-jit lax.map-chunked variant as the
mitigation candidate.

    python tools/rerank_bisect.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel import database as D

n_files, file_frames, L = 256, 1200, 96
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]
f_hit, off = 33, 100
tmpl = InputTemplate(feats[f_hit][:, off:off + L].copy())

db = D.FeatureDatabase(entries, norm=None)
print(f"devices: {jax.devices()}", file=sys.stderr)


@partial(jax.jit, static_argnames=("C", "L"))
def gather_only(xs_b, fi, fr, C: int, L: int):
    def one(i, t):
        return jax.lax.dynamic_slice(xs_b, (i, 0, t), (1, C, L))[0]
    return jax.vmap(one)(fi, fr)


@partial(jax.jit, static_argnames=("num_temporal", "chunk"))
def chunked_kernel(xs_b, shifts_t, fi, fr, tmpl_t, tmpl_s, a_std_t,
                   a_std_s, ln_avg, temp_weight, max_boost,
                   num_temporal: int = 1, chunk: int = 512):
    m = fi.shape[0]
    nc = -(-m // chunk)
    pad = nc * chunk - m
    fi_p = jnp.pad(fi, (0, pad)).reshape(nc, chunk)
    fr_p = jnp.pad(fr, (0, pad)).reshape(nc, chunk)

    def step(args):
        i, t = args
        return D._rerank_window_math(
            xs_b, shifts_t, i, t, tmpl_t, tmpl_s, a_std_t, a_std_s,
            ln_avg, temp_weight, max_boost, num_temporal=num_temporal)

    sims, boosts = jax.lax.map(step, (fi_p, fr_p))
    return sims.reshape(-1)[:m], boosts.reshape(-1)[:m]


C = feats.shape[1]
# production re-rank shapes are power-of-two buckets (_rerank_bucket,
# min 64) — probe each bucket boundary
for M in (64, 128, 256, 512, 1024):
    fi = ((np.arange(M, dtype=np.int32) * 7) % n_files)
    fr = ((np.arange(M, dtype=np.int32) * 37) % (file_frames - L - 8))
    fi[M // 2], fr[M // 2] = f_hit, off
    sims, _ = db._device_window_scores(fi, fr, tmpl, 0.5, 8.0)
    h_sims, _ = db._exact_window_scores(fi, fr, tmpl, 0.5, 8.0)
    d = np.max(np.abs(sims - h_sims))
    big = np.abs(h_sims) > 0.05
    ratio = sims[big] / h_sims[big]
    print(f"M={M:5d}: worst={d:.3e} planted |sim-1|="
          f"{abs(float(sims[M//2])-1.0):.3e} "
          f"ratio[min,max]=[{ratio.min():.4f},{ratio.max():.4f}] "
          f"n_big={big.sum()}", flush=True)

M = 2048
fi = ((np.arange(M, dtype=np.int32) * 7) % n_files)
fr = ((np.arange(M, dtype=np.int32) * 37) % (file_frames - L - 8))
fi[M // 2], fr[M // 2] = f_hit, off

# gather isolation: fetch the gathered windows, compare vs host windows
win = np.asarray(gather_only(db._xs, jnp.asarray(fi), jnp.asarray(fr),
                             C=C, L=L))
host_win = np.stack([np.asarray(db._xs[i, :, t:t + L])
                     for i, t in zip(fi, fr)])
gd = np.max(np.abs(win - host_win))
print(f"gather-only M={M}: worst |dev-host| = {gd:.3e} "
      f"{'FAIL (gather wrong)' if gd > 0 else 'EXACT (math wrong)'}",
      flush=True)

# chunked mitigation A/B at the failing shapes
tmpl_args = (tmpl.device_temporal(), tmpl.device_spectral(),
             jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
             jnp.float32(tmpl.ln_avg_loudness))
for M in (1024, 2048, 4096):
    fi = ((np.arange(M, dtype=np.int32) * 7) % n_files)
    fr = ((np.arange(M, dtype=np.int32) * 37) % (file_frames - L - 8))
    fi[M // 2], fr[M // 2] = f_hit, off
    h_sims, _ = db._exact_window_scores(fi, fr, tmpl, 0.5, 8.0)
    for chunk in (256, 512):
        sims, _ = chunked_kernel(
            db._xs, db._shifts, jnp.asarray(fi), jnp.asarray(fr),
            *tmpl_args, jnp.float32(0.5), jnp.float32(8.0),
            num_temporal=tmpl.num_temporal, chunk=chunk)
        d = np.max(np.abs(np.asarray(sims) - h_sims))
        print(f"chunked(M={M}, chunk={chunk}): worst={d:.3e} "
              f"planted |sim-1|={abs(float(sims[M//2])-1.0):.3e} "
              f"{'FAIL' if d > 1e-4 else 'ok'}", flush=True)
