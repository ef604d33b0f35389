"""Memmap-backed raw feature store (VERDICT r3 item 6): staging from a
one-shot generator keeps host RSS O(one file); every serving surface —
queries, exact re-ranks (host + device), incremental updates, restage,
save/load — works unchanged on the disk-backed store."""

import numpy as np
import pytest

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel.database import FeatureDatabase


def _entries(n=6, seed=0, T=180):
    rng = np.random.default_rng(seed)
    return [(f"f{i}.aif",
             np.abs(0.5 + 0.1 * rng.standard_normal((14, T + 9 * i))
                    ).astype(np.float32)) for i in range(n)]


def test_memmap_matches_memory():
    entries = _entries()
    tmpl = InputTemplate(entries[3][1][:, 40:90].copy())
    db_m = FeatureDatabase(entries, norm=None, pad_multiple=32)
    db_f = FeatureDatabase(entries, norm=None, pad_multiple=32,
                           raw_store="memmap")
    assert isinstance(db_f._raw, np.memmap)
    r1 = db_m.query(tmpl, k=2)
    r2 = db_f.query(tmpl, k=2)
    np.testing.assert_array_equal(r1.frames, r2.frames)
    np.testing.assert_allclose(r1.sims, r2.sims, atol=1e-6)
    # host exact re-rank gathers windows from the memmap
    h1 = db_m._exact_window_scores(np.array([3]), np.array([40]), tmpl,
                                   0.5, 8.0)
    h2 = db_f._exact_window_scores(np.array([3]), np.array([40]), tmpl,
                                   0.5, 8.0)
    np.testing.assert_array_equal(h1[0], h2[0])


def test_memmap_generator_entries_with_capacity():
    """A one-shot generator stages when time_capacity bounds the frames —
    the streaming mode that keeps a 10k build at O(one file) RSS."""
    entries = _entries(5)

    def gen():
        yield from entries

    db = FeatureDatabase(gen(), norm=None, pad_multiple=32,
                         raw_store="memmap", time_capacity=250)
    assert db.files == [n for n, _ in entries]
    tmpl = InputTemplate(entries[2][1][:, 10:60].copy())
    assert db.query(tmpl, k=1).frames[2, 0] == 10


def test_memmap_capacity_validation():
    entries = _entries(3)
    with pytest.raises(ValueError, match="capacity"):
        FeatureDatabase(iter(entries), norm=None, pad_multiple=32,
                        raw_store="memmap", time_capacity=64)
    with pytest.raises(ValueError, match="raw_store"):
        FeatureDatabase(entries, norm=None, raw_store="mmap")


def test_memmap_incremental_and_restage():
    entries = _entries(5)
    db = FeatureDatabase(entries, norm=None, pad_multiple=32,
                         raw_store="memmap")
    db.remove_files(["f1.aif"])
    rng = np.random.default_rng(7)
    new = np.abs(0.5 + 0.1 * rng.standard_normal((14, 150))
                 ).astype(np.float32)
    db.add_files([("new.aif", new)])          # fills the tombstone
    assert db.files[1] == "new.aif"
    tmpl = InputTemplate(new[:, 30:70].copy())
    assert db.query(tmpl, k=1).frames[1, 0] == 30
    # longer than capacity → restage; the store stays memmap-backed
    big = np.abs(0.5 + 0.1 * rng.standard_normal((14, 1200))
                 ).astype(np.float32)
    db.add_files([("big.aif", big)])
    assert db._raw_store == "memmap" and isinstance(db._raw, np.memmap)
    assert "big.aif" in db.files
    tb = InputTemplate(big[:, 500:560].copy())
    res = db.query(tb, k=1)
    assert res.frames[db.files.index("big.aif"), 0] == 500


def test_memmap_save_load(tmp_path):
    entries = _entries(4)
    db = FeatureDatabase(entries, norm=None, pad_multiple=32,
                         raw_store="memmap")
    db.save(tmp_path / "db.npz")
    db2 = FeatureDatabase.load(tmp_path / "db.npz")
    assert db2.files == db.files
    tmpl = InputTemplate(entries[1][1][:, 20:60].copy())
    np.testing.assert_array_equal(db.query(tmpl, k=1).frames,
                                  db2.query(tmpl, k=1).frames)


def test_memmap_chunked_staging(monkeypatch):
    """Slab-chunked staging from a memmap store (the 10k path: per-slab
    forced drain + MADV_DONTNEED) must produce the same results as the
    in-memory store."""
    from strugatzki_tpu.parallel import database as D
    entries = _entries(9)
    monkeypatch.setattr(D, "_QUERY_CHUNK", 4)
    db_m = FeatureDatabase(entries, norm=None, pad_multiple=32)
    db_f = FeatureDatabase(entries, norm=None, pad_multiple=32,
                           raw_store="memmap")
    tmpl = InputTemplate(entries[6][1][:, 40:90].copy())
    r1 = db_m.query(tmpl, k=2)
    r2 = db_f.query(tmpl, k=2)
    np.testing.assert_array_equal(r1.frames, r2.frames)
    np.testing.assert_allclose(r1.sims, r2.sims, atol=1e-6)
