"""Measure query_punch_batch vs sequential query_punch (VERDICT r3
item 4: done = >= 2x at 512 files x 8 punch pairs).

The batch kernel computes each file's forward spectra once for all pairs
in a bucket; sequential punch queries recompute them per query.

    python tools/punch_batch_bench.py [n_files] [n_pairs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel.database import FeatureDatabase

n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 512
n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
file_frames, l_in, l_out = 10336, 861, 430

rng = np.random.default_rng(0)
base = rng.uniform(0.3, 0.7, size=(n_files, 14, 1)).astype(np.float32)
feats = np.abs(base + 0.1 * rng.standard_normal(
    (n_files, 14, file_frames)).astype(np.float32))
entries = [(f"f{i}.aif", feats[i]) for i in range(n_files)]
def make_pairs(mp, xp):
    """Planted pair q: punch-in at 100+q, punch-out 3000 frames later —
    keep 3000 inside [mp, xp] so each pair has one true in-band hit."""
    assert mp <= 3000 <= xp
    out = []
    for q in range(n_pairs):
        src = feats[7 * q + 3]
        out.append((InputTemplate(src[:, 100 + q:100 + q + l_in].copy()),
                    InputTemplate(src[:, 3100 + q:3100 + q + l_out].copy()),
                    mp, xp))
    return out


t0 = time.perf_counter()
db = FeatureDatabase(entries, norm=None)
print(f"staged {n_files} files in {time.perf_counter()-t0:.0f}s", flush=True)

warm = make_pairs(2000, 3500)
t0 = time.perf_counter()
db.query_punch(*warm[0][:2], min_punch=2000, max_punch=3500, k=2)
print(f"punch compile {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
db.query_punch_batch(warm[:1], k=2)
print(f"batch(Q=1) compile {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
db.query_punch_batch(warm, k=2)
print(f"batch(Q={n_pairs}) compile {time.perf_counter()-t0:.0f}s", flush=True)

# the punch band is TRACED, so the narrow-band regime reuses the same
# compiled programs — two regimes measured per process/compile
for label, mp, xp in (("wide band 1501", 2000, 3500),
                      ("narrow band 51", 2980, 3030)):
    pairs = make_pairs(mp, xp)
    seq_ts, bat_ts = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        seq = [db.query_punch(p_in, p_out, min_punch=m, max_punch=x, k=2)
               for p_in, p_out, m, x in pairs]
        seq_ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        bat = db.query_punch_batch(pairs, k=2)
        bat_ts.append(time.perf_counter() - t0)
        print(f"  [{label}] seq {seq_ts[-1]*1e3:.0f} ms vs batch "
              f"{bat_ts[-1]*1e3:.0f} ms", flush=True)
    for q in range(n_pairs):
        # each pair's planted hit must win in both paths; beyond it the
        # files are noise — near-tie sims (~1e-7 apart) legitimately
        # reorder under the batch's different FFT rounding, so compare
        # top-1 + sim values, not the full frame ordering (the CPU tests
        # pin pair-for-pair equality on structured data)
        sm, bm = (r.matches(step_size=512, k_total=1)[0]
                  for r in (seq[q], bat[q]))
        assert sm.file == bm.file == f"f{7 * q + 3}.aif", (q, sm.file,
                                                           bm.file)
        assert sm.punch.start == bm.punch.start == (100 + q) * 512, q
        np.testing.assert_allclose(np.sort(seq[q].sims, axis=None),
                                   np.sort(bat[q].sims, axis=None),
                                   atol=1e-5)
    print(f"[{label}] {n_pairs} pairs x {n_files} files: sequential best "
          f"{min(seq_ts)*1e3:.0f} ms, batch best {min(bat_ts)*1e3:.0f} ms "
          f"-> x{min(seq_ts)/min(bat_ts):.2f} (planted hits equal, sims "
          f"within 1e-5)", flush=True)

# query_batch on the same database: Q single templates (the punch-in
# templates), batch vs sequential, planted-hit checked the same way
tmpls = [p[0] for p in make_pairs(2000, 3500)]
t0 = time.perf_counter()
db.query(tmpls[0], k=2)
print(f"query compile {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
db.query_batch(tmpls, k=2)
print(f"query_batch(Q={n_pairs}) compile {time.perf_counter()-t0:.0f}s",
      flush=True)
seq_ts, bat_ts = [], []
for _ in range(3):
    t0 = time.perf_counter()
    seq = [db.query(t, k=2) for t in tmpls]
    seq_ts.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    bat = db.query_batch(tmpls, k=2)
    bat_ts.append(time.perf_counter() - t0)
    print(f"  [query] seq {seq_ts[-1]*1e3:.0f} ms vs batch "
          f"{bat_ts[-1]*1e3:.0f} ms", flush=True)
for q in range(n_pairs):
    sm, bm = (r.matches(punch_len=l_in, step_size=512, k_total=1)[0]
              for r in (seq[q], bat[q]))
    assert sm.file == bm.file == f"f{7 * q + 3}.aif", (q, sm.file, bm.file)
    assert sm.punch.start == bm.punch.start == (100 + q) * 512, q
    np.testing.assert_allclose(np.sort(seq[q].sims, axis=None),
                               np.sort(bat[q].sims, axis=None), atol=1e-5)
print(f"[query] {n_pairs} templates x {n_files} files: sequential best "
      f"{min(seq_ts)*1e3:.0f} ms, batch best {min(bat_ts)*1e3:.0f} ms "
      f"-> x{min(seq_ts)/min(bat_ts):.2f} (planted hits equal, sims "
      f"within 1e-5)", flush=True)
