"""Repro stage 2: does correlation_trace_from_spectra diverge under a
template-axis vmap on TPU at the 10k bench scale (Tp=10752, L=861)?

    python tools/trace_vmap_repro.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.kernels import corr as K

C, Tp, L = 14, 10752, 861
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(C, 1)).astype(np.float32)
x = np.abs(base + 0.1 * rng.standard_normal((C, Tp)).astype(np.float32))
x[:, 100:100 + L] = x[:, 3100:3100 + L]        # plant an exact copy
xs, sh_t, _ = K.shift_per_group(x)
tmpl = InputTemplate(x[:, 3100:3100 + L].copy())
Q = 4

args_one = (tmpl.device_temporal(), tmpl.device_spectral(),
            jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
            jnp.float32(tmpl.ln_avg_loudness))
tt = jnp.stack([tmpl.device_temporal()] * Q)
ts = jnp.stack([tmpl.device_spectral()] * Q)
st_t = jnp.full((Q,), tmpl.temporal_std, jnp.float32)
st_s = jnp.full((Q,), tmpl.spectral_std, jnp.float32)
la = jnp.full((Q,), tmpl.ln_avg_loudness, jnp.float32)

print(f"devices: {jax.devices()}", file=sys.stderr)
xs_d = jnp.asarray(xs)
X, Xsq = jax.jit(K.trace_spectra)(xs_d)


@jax.jit
def one(X, Xsq):
    return K.correlation_trace_from_spectra(
        X, Xsq, Tp, *args_one, jnp.float32(sh_t), jnp.float32(0.5),
        jnp.float32(8.0))


@jax.jit
def batched(X, Xsq):
    def f(t1, t2, s1, s2, l):
        return K.correlation_trace_from_spectra(
            X, Xsq, Tp, t1, t2, s1, s2, l, jnp.float32(sh_t),
            jnp.float32(0.5), jnp.float32(8.0))
    return jax.vmap(f)(tt, ts, st_t, st_s, la)


sims1, boosts1 = jax.device_get(one(X, Xsq))
simsQ, boostsQ = jax.device_get(batched(X, Xsq))
W = Tp - L + 1
print(f"single: planted sim {sims1[100]:.6f} / {sims1[3100]:.6f}; "
      f"argmax {np.argmax(sims1)}")
for q in range(Q):
    d = np.abs(sims1[:W] - simsQ[q, :W]).max()
    print(f"vmapped q={q}: planted sim {simsQ[q, 100]:.6f}; "
          f"max|diff vs single| {d:.3e}")
db = np.abs(boosts1[:W] - boostsQ[0, :W]).max()
print(f"boost max|diff| {db:.3e}")
