"""Repro stage 4: is the device-side jnp.stack of cached per-template
arrays corrupted on this backend when a large resident DB exists?

    python tools/stack_repro.py [n_files]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel.database import FeatureDatabase

n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 512
file_frames, l_in = 10336, 861
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]
tmpls = [InputTemplate(feats[q + 1][:, 100 + q:100 + q + l_in].copy())
         for q in range(8)]

print(f"devices: {jax.devices()}", file=sys.stderr)
db = FeatureDatabase(entries, norm=None)
print("staged", flush=True)

tt = jnp.stack([t.device_temporal() for t in tmpls])
ts = jnp.stack([t.device_spectral() for t in tmpls])
host_t = np.stack([np.asarray(t.temporal_centered, np.float32)
                   for t in tmpls])
host_s = np.stack([np.asarray(t.spectral_centered, np.float32)
                   for t in tmpls])
got_t = np.asarray(tt)
got_s = np.asarray(ts)
print(f"stacked temporal: max|diff| {np.abs(got_t - host_t).max():.3e}")
print(f"stacked spectral: max|diff| {np.abs(got_s - host_s).max():.3e}")
for q in range(8):
    dt = np.abs(got_t[q] - host_t[q]).max()
    ds = np.abs(got_s[q] - host_s[q]).max()
    # also each individual cached device array round-trips?
    d1 = np.abs(np.asarray(tmpls[q].device_spectral()) - host_s[q]).max()
    print(f"q={q}: stack_t {dt:.3e} stack_s {ds:.3e} single_s {d1:.3e}")
