"""Repro stage 3: the real punch kernels, batch vs sequential, on a small
file count at full bench time-scale.  Finds the smallest shape where the
TPU batch kernel diverges (CPU is bit-exact at every shape tried).

    python tools/punch_vmap_repro.py [n_files]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel.database import FeatureDatabase

n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
file_frames, l_in, l_out = 10336, 861, 430
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]
pairs = []
for q in range(int(sys.argv[2]) if len(sys.argv) > 2 else 4):
    src = feats[(q + 1) % n_files]
    pairs.append((InputTemplate(src[:, 100 + q:100 + q + l_in].copy()),
                  InputTemplate(src[:, 3100 + q:3100 + q + l_out].copy()),
                  2000, 3500))

import jax
print(f"devices: {jax.devices()}", file=sys.stderr)
db = FeatureDatabase(entries, norm=None)
bat = db.query_punch_batch(pairs, k=2)
worst = 0.0
for q, (pi, po, mp, xp) in enumerate(pairs):
    sq = db.query_punch(pi, po, min_punch=mp, max_punch=xp, k=2)
    d = np.abs(np.nan_to_num(np.sort(sq.sims, axis=None), neginf=0)
               - np.nan_to_num(np.sort(bat[q].sims, axis=None), neginf=0)
               ).max()
    frames_eq = np.array_equal(sq.frames, bat[q].frames)
    lens_eq = np.array_equal(sq.punch_lens, bat[q].punch_lens)
    print(f"q={q}: seq top {np.max(sq.sims):.6f}, bat top "
          f"{np.max(bat[q].sims):.6f}, max|sorted-sims diff| {d:.3e}, "
          f"frames_eq={frames_eq} lens_eq={lens_eq}")
    worst = max(worst, float(d))
print("DIVERGED" if worst > 1e-4 else "ok", worst)

# query_batch has the same nesting structure — validate it at this shape
tmpls = [p for p, _, _, _ in pairs]
qb = db.query_batch(tmpls, k=2)
worst_q = 0.0
for q, t in enumerate(tmpls):
    single = db.query(t, k=2)
    d = np.abs(np.nan_to_num(np.sort(single.sims, axis=None), neginf=0)
               - np.nan_to_num(np.sort(qb[q].sims, axis=None), neginf=0)
               ).max()
    worst_q = max(worst_q, float(d))
    print(f"query_batch q={q}: top seq {np.max(single.sims):.6f} vs batch "
          f"{np.max(qb[q].sims):.6f}, max|sorted diff| {d:.3e}")
print("QUERY_BATCH DIVERGED" if worst_q > 1e-4 else "query_batch ok",
      worst_q)
