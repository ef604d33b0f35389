"""Incremental updates on a mesh-sharded database: removal re-shards only
the lens vector; adds restage with the mesh preserved."""

import numpy as np

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel.database import FeatureDatabase
from strugatzki_tpu.parallel.sweep import make_files_mesh


def _entries(seed, n, T=160, C=5):
    rng = np.random.default_rng(seed)
    return [(f"m{seed}_{i}.aif",
             np.abs(0.5 + 0.2 * rng.standard_normal((C, T))).astype(
                 np.float32)) for i in range(n)]


def _tuples(res, k=4):
    return [(m.file, m.punch.start, round(m.sim, 5))
            for m in res.matches(50, 512, k)]


def test_mesh_remove_then_add_matches_fresh():
    ents = _entries(21, 8)
    mesh = make_files_mesh()
    db = FeatureDatabase(ents, norm=None, pad_multiple=32, mesh=mesh)
    db.remove_files([ents[2][0], ents[5][0]])
    assert db.num_files == 6
    extra = _entries(22, 2, T=140)
    db.add_files(extra)                    # mesh path restages (8 rows again)
    assert db.num_files == 8 and db._mesh is mesh

    live = [e for i, e in enumerate(ents) if i not in (2, 5)] + extra
    fresh = FeatureDatabase(live, norm=None, pad_multiple=32)
    tmpl = InputTemplate(extra[1][1][:, 30:80].copy())
    assert _tuples(db.query(tmpl, k=2)) == _tuples(fresh.query(tmpl, k=2))

    # removed files never surface
    gone = InputTemplate(ents[2][1][:, 10:60].copy())
    hits = {m.file for m in db.query(gone, k=2).matches(50, 512, 8)}
    assert ents[2][0] not in hits
