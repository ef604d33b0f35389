"""Minimal repro: the sparse-table banded sliding-max of
_punch_one_from_spectra under one vs two vmap levels, vs a numpy oracle.

Round-4 finding: at 512x10336 scale the batched punch kernel returns
deterministically different (lower) sims than the sequential kernel on
TPU while CPU is bit-exact.  The suspect ops are the traced-start
dynamic_slices / traced-bound fori_loop under the second vmap level.

    python tools/bandmax_repro.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

W_in, Tp, L_out = 9892, 10752, 430
W_out = Tp - L_out + 1
pad = W_in + Tp - W_out
w_pad = W_out + pad
B, Q = 4, 4


def band_max(out_vals, min_punch, scan_span):
    """Verbatim transcription of the sparse-table block from
    _punch_one_from_spectra (values + argmax)."""
    n_levels = max(1, int(np.ceil(np.log2(w_pad))) + 1)
    j_sel = 31 - jax.lax.clz(jnp.maximum(scan_span, 1).astype(jnp.int32))
    j_sel = jnp.clip(j_sel, 0, n_levels - 1)
    p = jnp.left_shift(jnp.int32(1), j_sel)
    neg_pad = jnp.full((w_pad,), -jnp.inf, out_vals.dtype)
    zero_pad = jnp.zeros((w_pad,), jnp.int32)

    def double(j, carry):
        v, a = carry
        sh = jnp.left_shift(jnp.int32(1), j)
        v2 = jax.lax.dynamic_slice(
            jnp.concatenate([v, neg_pad]), (sh,), (w_pad,))
        a2 = jax.lax.dynamic_slice(
            jnp.concatenate([a, zero_pad]), (sh,), (w_pad,))
        take = v2 > v
        return jnp.where(take, v2, v), jnp.where(take, a2, a)

    lv, la = jax.lax.fori_loop(
        0, j_sel, double, (out_vals, jnp.arange(w_pad, dtype=jnp.int32)))
    v1 = jax.lax.dynamic_slice(lv, (min_punch,), (W_in,))
    a1 = jax.lax.dynamic_slice(la, (min_punch,), (W_in,))
    off2 = min_punch + scan_span - p
    v2 = jax.lax.dynamic_slice(lv, (off2,), (W_in,))
    a2 = jax.lax.dynamic_slice(la, (off2,), (W_in,))
    take2 = v2 > v1
    return jnp.where(take2, v2, v1), jnp.where(take2, a2, a1)


def oracle(ov, mp, span):
    best = np.full(W_in, -np.inf, np.float32)
    arg = np.zeros(W_in, np.int64)
    for t in range(W_in):
        seg = ov[t + mp:t + mp + span]
        j = int(np.argmax(seg))
        best[t] = seg[j]
        arg[t] = t + mp + j
    return best, arg


rng = np.random.default_rng(0)
ov = rng.standard_normal((B, Q, w_pad)).astype(np.float32)
ov[:, :, W_out:] = -np.inf        # the padded tail
mp, span = 2000, 1501
mps = jnp.full((Q,), mp, jnp.int32)
spans = jnp.full((Q,), span, jnp.int32)

single = jax.jit(jax.vmap(lambda o: band_max(o, jnp.int32(mp),
                                             jnp.int32(span))))
double_v = jax.jit(jax.vmap(lambda o_q: jax.vmap(band_max)(o_q, mps, spans)))

print(f"devices: {jax.devices()}", file=sys.stderr)
v_s, a_s = jax.device_get(single(ov.reshape(B * Q, w_pad)))
v_s = v_s.reshape(B, Q, W_in)
a_s = a_s.reshape(B, Q, W_in)
v_d, a_d = jax.device_get(double_v(ov))

ref_v, ref_a = oracle(ov[1, 2], mp, span)
for name, v, a in (("single-vmap", v_s[1, 2], a_s[1, 2]),
                   ("double-vmap", v_d[1, 2], a_d[1, 2])):
    dv = np.max(np.abs(np.nan_to_num(v, neginf=0)
                       - np.nan_to_num(ref_v, neginf=0)))
    da = int((a != ref_a).sum())
    print(f"{name:12s}: max|val diff| {dv:.3e}, argmax mismatches {da}/{W_in}")
dv = np.max(np.abs(np.nan_to_num(v_s, neginf=0) - np.nan_to_num(v_d, neginf=0)))
print(f"single vs double: max|val diff| {dv:.3e}, "
      f"arg mismatches {int((a_s != a_d).sum())}")
