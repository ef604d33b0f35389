"""Direct hardware repro for the device exact re-rank kernel: score a
planted exact-match window through ``_rerank_window_kernel`` at a sweep of
candidate counts M and compare against the host f64 oracle.

The round-4 TPU backend fault deflated vmapped batched trace kernels at
power-of-two >= 2048 fused lanes; the compact canary (round 5) caught the
EXACT-rerank families wrong on hardware at M = 2048 candidates while the
raw trace families were clean — this isolates whether the re-rank kernel
itself is the faulting program and at which M.

    python tools/rerank_repro.py [n_files]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel import database as D

n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 256
file_frames, L = 1200, 96
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]
f_hit, off = 33, 100
tmpl = InputTemplate(feats[f_hit][:, off:off + L].copy())

db = D.FeatureDatabase(entries, norm=None)
print(f"devices: {jax.devices()}", file=sys.stderr)

for M in (64, 1024, 2000, 2048, 2049, 3072, 4096):
    m = min(M, n_files * 16)
    fi = (np.arange(m, dtype=np.int32) * 7) % n_files
    fr = (np.arange(m, dtype=np.int32) * 37) % (file_frames - L - 8)
    # plant the exact match in the middle of the candidate list
    fi[m // 2], fr[m // 2] = f_hit, off
    sims, boosts = db._device_window_scores(fi, fr, tmpl, 0.5, 8.0)
    h_sims, h_boosts = db._exact_window_scores(fi, fr, tmpl, 0.5, 8.0)
    d = np.max(np.abs(sims - h_sims))
    d_pl = abs(float(sims[m // 2]) - 1.0)
    print(f"M={m:5d}: worst |dev-host|={d:.3e}  planted |sim-1|={d_pl:.3e}"
          f"  {'FAIL' if d > 1e-4 else 'ok'}", flush=True)
