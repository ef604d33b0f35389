"""Isolate WHICH op of the device re-rank kernel is wrong on the current
backend (tools/rerank_bisect.py: sims wrong from M=128 with non-uniform
ratios, gather exact when materialized, per-step chunking no help).

Stages, all at a failing M:

1. same program, but ALSO return the gathered windows (materialization
   may change fusion — diagnostic, not a fix);
2. scoring math on a HOST-UPLOADED [M, C, L] window stack (no gather in
   the program) — splits gather-fusion faults from reduction faults;
3. alternative dot formulations on the uploaded stack (einsum vs
   flattened matmul vs explicit multiply-sum);
4. alternative gather formulations feeding the same math.

    python tools/rerank_isolate.py [M]
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

M = int(sys.argv[1]) if len(sys.argv) > 1 else 512
n_files, file_frames, L = 256, 1200, 96
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]
f_hit, off = 33, 100
tmpl = InputTemplate(feats[f_hit][:, off:off + L].copy())
db = D.FeatureDatabase(entries, norm=None)
C = feats.shape[1]
print(f"devices: {jax.devices()}  M={M}", file=sys.stderr)

fi = ((np.arange(M, dtype=np.int32) * 7) % n_files)
fr = ((np.arange(M, dtype=np.int32) * 37) % (file_frames - L - 8))
fi[M // 2], fr[M // 2] = f_hit, off
h_sims, h_boosts = db._exact_window_scores(fi, fr, tmpl, 0.5, 8.0)
host_win = np.stack([np.asarray(db._xs[i, :, t:t + L])
                     for i, t in zip(fi, fr)])

targs = (tmpl.device_temporal(), tmpl.device_spectral(),
         jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
         jnp.float32(tmpl.ln_avg_loudness))
nt = tmpl.num_temporal
fi_d, fr_d = jnp.asarray(fi), jnp.asarray(fr)


def judge(name, sims, win=None):
    d = float(np.max(np.abs(np.asarray(sims) - h_sims)))
    extra = ""
    if win is not None:
        gd = float(np.max(np.abs(np.asarray(win) - host_win)))
        extra = f"  win|Δ|={gd:.3e}"
    print(f"{name:32s} worst={d:.3e} planted |sim-1|="
          f"{abs(float(sims[M//2])-1.0):.3e} "
          f"{'FAIL' if d > 1e-4 else 'ok'}{extra}", flush=True)


# -- 0. production kernel (baseline failure) ------------------------------
sims, _ = db._device_window_scores(fi, fr, tmpl, 0.5, 8.0)
judge("production kernel", sims[:M])


# -- 1. same program + materialized windows -------------------------------
@jax.jit
def with_win(xs_b, shifts_t, fi, fr, tt, ts, st, ss, la):
    def one(i, t):
        return jax.lax.dynamic_slice(xs_b, (i, 0, t), (1, C, L))[0]
    win = jax.vmap(one)(fi, fr).astype(jnp.float32)
    s, b = D._rerank_window_math(xs_b, shifts_t, fi, fr, tt, ts, st, ss,
                                 la, jnp.float32(0.5), jnp.float32(8.0),
                                 num_temporal=nt)
    return s, win


s1, w1 = with_win(db._xs, db._shifts, fi_d, fr_d, *targs)
judge("kernel + returned windows", s1, w1)


# -- 2. math on uploaded windows (no gather) -------------------------------
win_up = jnp.asarray(host_win)


@jax.jit
def math_only(win, shifts_t, fi, tt, ts, st, ss, la):
    def group(rows, tmpl_, a_std, n_cells):
        s = rows.sum(axis=(1, 2))
        q = (rows * rows).sum(axis=(1, 2))
        mu = s / n_cells
        var = jnp.maximum(q / n_cells - mu * mu, 0.0)
        dot = jnp.einsum("mcl,cl->m", rows, tmpl_,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return dot / (a_std * jnp.sqrt(var) * n_cells)

    sim_t = group(win[:, :nt], tt, st, nt * L)
    sim_s = group(win[:, nt:], ts, ss, (C - nt) * L)
    sim = sim_t * 0.5 + sim_s * 0.5
    loud_mean = win[:, 0].sum(axis=1) / L + shifts_t[fi]
    boost = jnp.exp((la - jnp.log(loud_mean)) / 0.6)
    return jnp.where(boost <= 8.0, sim, 0.0)


judge("math on uploaded windows",
      math_only(win_up, db._shifts, fi_d, *targs))


# -- 3. dot formulations on uploaded windows ------------------------------
@jax.jit
def dots_flat(win, tt, ts, st, ss):
    wt = win[:, :nt].reshape(M, -1)
    ws = win[:, nt:].reshape(M, -1)
    def group(rows, tmpl_, a_std, n_cells):
        s = rows.sum(axis=1)
        q = (rows * rows).sum(axis=1)
        mu = s / n_cells
        var = jnp.maximum(q / n_cells - mu * mu, 0.0)
        dot = rows @ tmpl_.reshape(-1)
        return dot / (a_std * jnp.sqrt(var) * n_cells)
    return (group(wt, tt, st, nt * L) * 0.5
            + group(ws, ts, ss, (C - nt) * L) * 0.5)


sims3 = dots_flat(win_up, *targs[:4])
# boost gate applied host-side for comparability
lm = host_win[:, 0].sum(axis=1) / L + np.asarray(db._shifts)[fi]
gate = np.exp((float(tmpl.ln_avg_loudness) - np.log(lm)) / 0.6) <= 8.0
judge("flat matmul on uploaded", np.where(gate, np.asarray(sims3), 0.0))


# -- 4. alternative gathers feeding the production math -------------------
@jax.jit
def gather_scan(xs_b, shifts_t, fi, fr, tt, ts, st, ss, la):
    def one(carry, it):
        i, t = it
        return carry, jax.lax.dynamic_slice(xs_b, (i, 0, t), (1, C, L))[0]
    _, win = jax.lax.scan(one, 0, (fi, fr))
    win = win.astype(jnp.float32)
    return math_from_win(win, shifts_t, fi, tt, ts, st, ss, la)


def math_from_win(win, shifts_t, fi, tt, ts, st, ss, la):
    def group(rows, tmpl_, a_std, n_cells):
        s = rows.sum(axis=(1, 2))
        q = (rows * rows).sum(axis=(1, 2))
        mu = s / n_cells
        var = jnp.maximum(q / n_cells - mu * mu, 0.0)
        dot = jnp.einsum("mcl,cl->m", rows, tmpl_,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return dot / (a_std * jnp.sqrt(var) * n_cells)
    sim = (group(win[:, :nt], tt, st, nt * L) * 0.5
           + group(win[:, nt:], ts, ss, (C - nt) * L) * 0.5)
    loud_mean = win[:, 0].sum(axis=1) / L + shifts_t[fi]
    boost = jnp.exp((la - jnp.log(loud_mean)) / 0.6)
    return jnp.where(boost <= 8.0, sim, 0.0)


judge("scan gather + same math",
      gather_scan(db._xs, db._shifts, fi_d, fr_d, *targs))


@jax.jit
def gather_barrier(xs_b, shifts_t, fi, fr, tt, ts, st, ss, la):
    def one(i, t):
        return jax.lax.dynamic_slice(xs_b, (i, 0, t), (1, C, L))[0]
    win = jax.vmap(one)(fi, fr).astype(jnp.float32)
    win = jax.lax.optimization_barrier(win)
    return math_from_win(win, shifts_t, fi, tt, ts, st, ss, la)


judge("vmap gather + barrier + math",
      gather_barrier(db._xs, db._shifts, fi_d, fr_d, *targs))
