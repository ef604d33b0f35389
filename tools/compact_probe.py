"""Decompose the compact-mode 10k query cost in ONE process (one remote
compile): pure device query (re-rank off) vs device re-rank vs host
re-rank, plus the re-rank kernel alone — the numbers that decide where the
<1 s north-star gap lives.

The k=16 device program is shared between `query(k=16, exact_rerank=False)`
and `query(k=4)` (whose automatic inflation also runs the k=16 kernel), so
toggling the re-rank does not recompile.

    python tools/compact_probe.py [n_files]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel.database import FeatureDatabase

n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
file_frames, punch = 10336, 861
rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]
hit_i = min(77, n_files - 1)
tmpl = InputTemplate(feats[hit_i][:, 100:100 + punch].copy())

t0 = time.perf_counter()
db = FeatureDatabase(entries, norm=None, cache_spectra="bf16")
print(f"staged in {time.perf_counter()-t0:.0f}s", flush=True)

t0 = time.perf_counter()
db.query(tmpl, k=16, exact_rerank=False)
print(f"query compile {time.perf_counter()-t0:.0f}s", flush=True)


def best(f, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts), [round(t * 1e3) for t in ts]


t_dev, all_dev = best(lambda: db.query(tmpl, k=16, exact_rerank=False))
print(f"device query only (k=16, no re-rank): best {t_dev*1e3:.0f} ms "
      f"{all_dev}", flush=True)

t_full, all_full = best(lambda: db.query(tmpl, k=4))
print(f"query + DEVICE re-rank (k=4 -> k_dev=16): best {t_full*1e3:.0f} ms "
      f"{all_full}", flush=True)

db._rerank_device = False
t_host, all_host = best(lambda: db.query(tmpl, k=4), n=2)
print(f"query + HOST re-rank: best {t_host*1e3:.0f} ms {all_host}",
      flush=True)
db._rerank_device = True

# re-rank kernel alone at the 4096 cap (warm first call separately)
m = min(4096, n_files * 16)
fi = np.repeat(np.arange(n_files, dtype=np.int32), 16)[:m]
fr = np.tile(np.arange(16, dtype=np.int32) * 37, n_files)[:m] % 2000
t0 = time.perf_counter()
db._device_window_scores(fi, fr, tmpl, 0.5, 8.0)
print(f"re-rank kernel compile+run {time.perf_counter()-t0:.1f}s",
      flush=True)
t_rr, all_rr = best(lambda: db._device_window_scores(fi, fr, tmpl, 0.5, 8.0))
print(f"re-rank kernel alone ({m} windows): best {t_rr*1e3:.0f} ms {all_rr}",
      flush=True)

res = db.query(tmpl, k=4)
print(f"hit: {res.frames[hit_i,0]} sim={res.sims[hit_i,0]:.4f}", flush=True)
