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

# ---- punch decomposition (--punch): where do the ~1000 ms go? ----------
# The k=16 device punch program is shared between
# query_punch(k=16, exact_rerank=False) and query_punch(k=4) (automatic
# 4x inflation on reduced spectra), so the re-rank toggle costs no extra
# compile; the punch BAND is traced (min_punch / band width are runtime
# values), so the wide-vs-narrow A/B reuses the same program too.
if "--punch" in sys.argv:
    l_out = 430
    o_out = 3100
    out_tmpl = InputTemplate(
        feats[hit_i][:, o_out:o_out + l_out].copy())

    def punch(mp, xp, **kw):
        return db.query_punch(tmpl, out_tmpl, min_punch=mp, max_punch=xp,
                              k=kw.pop("k", 4), **kw)

    t0 = time.perf_counter()
    punch(2000, 3500, k=16, exact_rerank=False)
    print(f"punch compile {time.perf_counter()-t0:.0f}s", flush=True)

    t_pd, all_pd = best(lambda: punch(2000, 3500, k=16, exact_rerank=False))
    print(f"device punch only (k=16, band 1501, no re-rank): best "
          f"{t_pd*1e3:.0f} ms {all_pd}", flush=True)
    t_pf, all_pf = best(lambda: punch(2000, 3500))
    print(f"punch + DEVICE re-rank (k=4 -> k_dev=16): best "
          f"{t_pf*1e3:.0f} ms {all_pf}  [re-rank share "
          f"{(t_pf - t_pd)*1e3:.0f} ms]", flush=True)
    t_pn, all_pn = best(lambda: punch(2950, 3050, k=16, exact_rerank=False))
    print(f"device punch narrow band 101 (same program): best "
          f"{t_pn*1e3:.0f} ms {all_pn}  [band share "
          f"{(t_pd - t_pn)*1e3:.0f} ms]", flush=True)
    db._rerank_device = False
    t_ph, all_ph = best(lambda: punch(2000, 3500), n=2)
    db._rerank_device = True
    print(f"punch + HOST re-rank: best {t_ph*1e3:.0f} ms {all_ph}",
          flush=True)
    pres = punch(2000, 3500)
    print(f"punch hit: frame {pres.frames[hit_i,0]} len "
          f"{pres.min_punch + pres.punch_lens[hit_i,0]} "
          f"sim={pres.sims[hit_i,0]:.4f}", flush=True)
    assert abs(float(pres.sims[hit_i, 0]) - 1.0) < 1e-3, \
        "planted punch hit deflated"
