"""Templates near (or beyond) the database's padded time capacity must not
crash the device top-k: ``t_cap − L + 1`` windows can be smaller than the
requested ``k`` (clamp + column pad) or non-positive (all-masked result —
the documented serving rule excludes files shorter than the template).

Regression for a ``lax.top_k`` ValueError: a 510-frame template against a
512-frame padded capacity left 3 windows while k defaulted to 4.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.parallel.database import FeatureDatabase


def _db(seed=0, n=3, T=100, C=4, **kw):
    rng = np.random.default_rng(seed)
    ents = [(f"f{i}.aif",
             np.abs(0.5 + 0.2 * rng.standard_normal((C, T))).astype(
                 np.float32)) for i in range(n)]
    return ents, FeatureDatabase(ents, norm=None, **kw)


def _tmpl_of_len(L, C=4, seed=9):
    rng = np.random.default_rng(seed)
    return InputTemplate(
        np.abs(0.5 + 0.2 * rng.standard_normal((C, L))).astype(np.float32))


def test_query_k_larger_than_window_count_pads():
    ents, db = _db()
    assert db._xs.shape[2] == 512                 # padded capacity
    res = db.query(_tmpl_of_len(510), k=4)        # 3 windows < k
    assert res.sims.shape == (len(ents), 4)
    # every file is shorter than the template -> nothing finite
    assert res.matches(510, 512, 10) == []
    assert not np.isfinite(res.sims).any()


def test_query_k_clamp_keeps_real_hits():
    # one file fills the capacity exactly: 3 real windows, k=4 -> the
    # planted self-match must still come back first, 4th column padded
    rng = np.random.default_rng(3)
    full = np.abs(0.5 + 0.2 * rng.standard_normal((4, 512))).astype(
        np.float32)
    short = np.abs(0.5 + 0.2 * rng.standard_normal((4, 100))).astype(
        np.float32)
    db = FeatureDatabase([("full.aif", full), ("short.aif", short)],
                         norm=None)
    res = db.query(InputTemplate(full[:, 1:511].copy()), k=4)
    assert res.sims.shape == (2, 4)
    m = res.matches(510, 512, 1)[0]
    assert m.file == "full.aif" and m.sim == pytest.approx(1.0, abs=1e-5)
    assert not np.isfinite(res.sims[:, 3]).any()  # padded column


def test_query_template_beyond_capacity_returns_empty():
    ents, db = _db()
    res = db.query(_tmpl_of_len(600), k=4)
    assert res.sims.shape == (len(ents), 4)
    assert res.matches(600, 512, 10) == []
    with pytest.raises(ValueError, match="padded time capacity"):
        db.query(_tmpl_of_len(600), k=4, with_traces=True)


def test_query_capacity_reduced_storage_rerank():
    # the 4x k-inflation path must clamp too (bf16 -> exact re-rank)
    ents, db = _db(storage_dtype=jnp.bfloat16)
    res = db.query(_tmpl_of_len(511), k=4)        # 2 windows < k
    assert res.sims.shape == (len(ents), 4)
    assert res.matches(511, 512, 10) == []


def test_query_punch_near_capacity():
    ents, db = _db()
    t_in = _tmpl_of_len(505)
    t_out = _tmpl_of_len(20, seed=11)
    res = db.query_punch(t_in, t_out, min_punch=2, max_punch=5, k=4)
    assert res.sims.shape == (len(ents), 4)
    assert res.matches(512, 10) == []
    # punch-out beyond capacity -> all-masked, no crash
    res = db.query_punch(t_in, _tmpl_of_len(600, seed=12),
                         min_punch=2, max_punch=5, k=4)
    assert res.matches(512, 10) == []


def test_query_batch_mixed_capacity_templates():
    ents, db = _db(n=4)
    normal = InputTemplate(ents[1][1][:, 10:70].copy())
    res = db.query_batch([normal, _tmpl_of_len(510), _tmpl_of_len(600)],
                         k=4)
    assert [r.sims.shape for r in res] == [(4, 4)] * 3
    want = db.query(normal, k=4)
    np.testing.assert_allclose(res[0].sims, want.sims, rtol=1e-5)
    assert res[0].matches(60, 512, 1)[0].file == ents[1][0]
    assert res[1].matches(510, 512, 10) == []
    assert res[2].matches(600, 512, 10) == []


def test_query_punch_batch_mixed_capacity_pairs():
    ents, db = _db(n=4)
    p_in = InputTemplate(ents[2][1][:, 5:45].copy())
    p_out = InputTemplate(ents[2][1][:, 60:80].copy())
    pairs = [(p_in, p_out, 10, 20),
             (_tmpl_of_len(505), _tmpl_of_len(20, seed=11), 2, 5),
             (_tmpl_of_len(40, seed=13), _tmpl_of_len(600, seed=12), 2, 5)]
    res = db.query_punch_batch(pairs, k=4)
    assert [r.sims.shape for r in res] == [(4, 4)] * 3
    want = db.query_punch(p_in, p_out, min_punch=10, max_punch=20, k=4)
    gm = [(m.file, m.punch.start, round(m.sim, 6))
          for m in res[0].matches(512, 3)]
    wm = [(m.file, m.punch.start, round(m.sim, 6))
          for m in want.matches(512, 3)]
    assert gm == wm
    assert res[1].matches(512, 10) == []
    assert res[2].matches(512, 10) == []
