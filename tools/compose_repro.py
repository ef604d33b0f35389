"""Repro stage 5: bisect INSIDE the composed batch program at the failing
shape [512 files x 8 pairs].  Returns per-pair planted-window values from
each stage of the pipeline so the wrong stage identifies itself.

    python tools/compose_repro.py [n_files]
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.parallel.sweep import pad_stack

n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 512
file_frames, l_in, l_out = 10336, 861, 430
Q = 8
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
prepared, shifts = [], []
for f in feats:
    xs, sh_t, _ = K.shift_per_group(f)
    prepared.append(xs)
    shifts.append(sh_t)
xs_b, lens = pad_stack(prepared, multiple=512)
Tp = xs_b.shape[2]

tmpls = [InputTemplate(feats[q + 1][:, 100 + q:100 + q + l_in].copy())
         for q in range(Q)]
outs = [InputTemplate(feats[q + 1][:, 3100 + q:3100 + q + l_out].copy())
        for q in range(Q)]
file_ids = jnp.asarray([q + 1 for q in range(Q)], jnp.int32)
t_in = jnp.asarray([100 + q for q in range(Q)], jnp.int32)
t_out = jnp.asarray([3100 + q for q in range(Q)], jnp.int32)

tt = jnp.stack([t.device_temporal() for t in tmpls])
ts = jnp.stack([t.device_spectral() for t in tmpls])
st_t = jnp.asarray([t.temporal_std for t in tmpls], jnp.float32)
st_s = jnp.asarray([t.spectral_std for t in tmpls], jnp.float32)
la = jnp.asarray([t.ln_avg_loudness for t in tmpls], jnp.float32)
ot = jnp.stack([t.device_temporal() for t in outs])
os_ = jnp.stack([t.device_spectral() for t in outs])
ost_t = jnp.asarray([t.temporal_std for t in outs], jnp.float32)
ost_s = jnp.asarray([t.spectral_std for t in outs], jnp.float32)
ola = jnp.asarray([t.ln_avg_loudness for t in outs], jnp.float32)
shifts_d = jnp.asarray(np.asarray(shifts, np.float32))


@jax.jit
def diag(xs_b):
    X_b, Xsq_b = jax.vmap(K.trace_spectra)(xs_b)

    def pair_trace(t1, t2, s1, s2, l):
        def one_file(X, Xsq, sh):
            sims, _ = K.correlation_trace_from_spectra(
                X, Xsq, Tp, t1, t2, s1, s2, l, sh,
                jnp.float32(0.5), jnp.float32(8.0))
            return sims
        return jax.vmap(one_file)(X_b, Xsq_b, shifts_d)   # [B, W]

    sims_in = jax.vmap(pair_trace)(tt, ts, st_t, st_s, la)     # [Q, B, W]
    sims_out = jax.vmap(pair_trace)(ot, os_, ost_t, ost_s, ola)
    qi = jnp.arange(Q)
    return (sims_in[qi, file_ids, t_in], sims_out[qi, file_ids, t_out])


print(f"devices: {jax.devices()}", file=sys.stderr)
si, so = jax.device_get(diag(jnp.asarray(xs_b)))
for q in range(Q):
    print(f"q={q}: planted in-sim {si[q]:.6f} (want 1.0), "
          f"out-sim {so[q]:.6f} (want 1.0)")
