"""``num_temporal`` on the serving path: the temporal/spectral channel
split (the reference's numTemporal, FeatureCorrelation.scala:279-289) is a
database property — staging group-shifts and every query kernel must use
it, and templates are validated against it.

Regression: the kernels all accepted ``num_temporal`` but the database
never threaded it, silently scoring an ``InputTemplate(block, 2)`` with
nt=1 device semantics while the host exact mirror honored the template's
split.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.parallel.database import FeatureDatabase


NT = 2


def _entries(seed=0, n=6, C=6, T=160, prefix="f"):
    rng = np.random.default_rng(seed)
    return [(f"{prefix}{i}.aif",
             np.abs(0.5 + 0.2 * rng.standard_normal((C, T + 11 * i))
                    ).astype(np.float32)) for i in range(n)]


def test_planted_self_match_nt2():
    ents = _entries()
    db = FeatureDatabase(ents, norm=None, pad_multiple=64, num_temporal=NT)
    tmpl = InputTemplate(ents[3][1][:, 30:80].copy(), num_temporal=NT)
    res = db.query(tmpl, k=3)
    assert res.frames[3, 0] == 30
    assert abs(res.sims[3, 0] - 1.0) < 1e-3


def test_traces_match_per_file_path_nt2():
    """Dense nt=2 device traces equal the per-file trace path at nt=2 —
    and DIFFER from the nt=1 scoring of the same data (the thread must
    actually reach the kernels)."""
    ents = _entries(seed=4, n=4)
    tmpl = InputTemplate(ents[1][1][:, 20:70].copy(), num_temporal=NT)
    db = FeatureDatabase(ents, norm=None, pad_multiple=64, num_temporal=NT)
    _, (sims_b, _boosts, _lens) = db.query(tmpl, with_traces=True)
    diffs = 0.0
    for i in range(4):
        feats = ents[i][1]
        xs, sh, _ = K.shift_per_group(feats.astype(np.float32),
                                      num_temporal=NT)
        sims, _ = K.correlation_trace(
            jnp.asarray(xs), tmpl.device_temporal(), tmpl.device_spectral(),
            jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
            jnp.float32(tmpl.ln_avg_loudness), jnp.float32(sh),
            jnp.float32(0.5), jnp.float32(8.0), num_temporal=NT)
        w = feats.shape[1] - 50 + 1
        np.testing.assert_allclose(sims_b[i, :w], np.asarray(sims)[:w],
                                   atol=3e-5)
        xs1, sh1, _ = K.shift_per_group(feats.astype(np.float32))
        t1 = InputTemplate(ents[1][1][:, 20:70].copy())
        sims1, _ = K.correlation_trace(
            jnp.asarray(xs1), t1.device_temporal(), t1.device_spectral(),
            jnp.float32(t1.temporal_std), jnp.float32(t1.spectral_std),
            jnp.float32(t1.ln_avg_loudness), jnp.float32(sh1),
            jnp.float32(0.5), jnp.float32(8.0))
        diffs = max(diffs, float(np.abs(
            sims_b[i, :w] - np.asarray(sims1)[:w]).max()))
    assert diffs > 1e-4          # nt=2 scoring is genuinely different


def test_exact_rerank_agrees_with_device_nt2():
    """The host f64 mirror honors the template's split; after threading,
    the device sims must agree with it at nt=2 (they could not before)."""
    ents = _entries(seed=7, n=5)
    db = FeatureDatabase(ents, norm=None, pad_multiple=64, num_temporal=NT)
    tmpl = InputTemplate(ents[2][1][:, 10:60].copy(), num_temporal=NT)
    plain = db.query(tmpl, k=4, exact_rerank=False)
    exact = db.query(tmpl, k=4, exact_rerank=True)
    np.testing.assert_allclose(plain.sims, exact.sims, atol=1e-4)
    np.testing.assert_array_equal(plain.frames, exact.frames)


def test_compact_mode_nt2_matches_plain():
    """nt=2 through the COMPACT path (bf16 forward spectra + on-the-fly
    window-sum tables, which grow the channel-0 boost row at nt!=1, +
    exact re-rank): query, punch, and batch results must match the plain
    f32 database — the sums trace's nt!=1 row and the nt-aware re-rank
    both live on this path."""
    ents = _entries(seed=11, n=6, C=8, T=200)
    plain = FeatureDatabase(ents, norm=None, pad_multiple=64,
                            num_temporal=NT)
    compact = FeatureDatabase(ents, norm=None, pad_multiple=64,
                              num_temporal=NT, cache_spectra="bf16")
    assert compact._spectra_reduced and compact._rerank_device
    tmpl = InputTemplate(ents[4][1][:, 25:75].copy(), num_temporal=NT)
    want = plain.query(tmpl, k=3)
    got = compact.query(tmpl, k=3)
    np.testing.assert_array_equal(got.frames, want.frames)
    np.testing.assert_allclose(got.sims, want.sims, atol=1e-5)
    t_in = InputTemplate(ents[2][1][:, 5:45].copy(), num_temporal=NT)
    t_out = InputTemplate(ents[2][1][:, 70:100].copy(), num_temporal=NT)
    wp = plain.query_punch(t_in, t_out, min_punch=30, max_punch=80, k=2)
    gp = compact.query_punch(t_in, t_out, min_punch=30, max_punch=80, k=2)
    np.testing.assert_array_equal(gp.frames[:, 0], wp.frames[:, 0])
    np.testing.assert_allclose(gp.sims, wp.sims, atol=1e-5)
    wb = plain.query_batch([tmpl, t_in], k=2)
    gb = compact.query_batch([tmpl, t_in], k=2)
    for w, g in zip(wb, gb):
        np.testing.assert_array_equal(g.frames, w.frames)
        np.testing.assert_allclose(g.sims, w.sims, atol=1e-5)


def test_punch_and_batch_nt2():
    ents = _entries(seed=9, n=5)
    db = FeatureDatabase(ents, norm=None, pad_multiple=64, num_temporal=NT)
    t_in = InputTemplate(ents[1][1][:, 5:45].copy(), num_temporal=NT)
    t_out = InputTemplate(ents[1][1][:, 70:100].copy(), num_temporal=NT)
    res = db.query_punch(t_in, t_out, min_punch=30, max_punch=80, k=2)
    m = res.matches(512, 1)[0]
    assert m.file == "f1.aif" and m.sim == pytest.approx(1.0, abs=1e-3)
    # batch == sequential at nt=2
    t2 = InputTemplate(ents[3][1][:, 12:52].copy(), num_temporal=NT)
    batch = db.query_batch([t_in, t2], k=3)
    for t, r in zip((t_in, t2), batch):
        want = db.query(t, k=3)
        np.testing.assert_allclose(r.sims, want.sims, atol=1e-6)
        np.testing.assert_array_equal(r.frames, want.frames)


def test_sliding_traces_nt2_planted():
    """analysis.correlation.sliding_traces must thread the template's
    split (regression: a planted exact self-match scored 0.776 with the
    nt=1 default grouping)."""
    from strugatzki_tpu.analysis.correlation import sliding_traces

    rng = np.random.default_rng(21)
    feats = np.abs(0.5 + 0.2 * rng.standard_normal((6, 200))).astype(
        np.float32)
    xs, sh_t, sh_s = K.shift_per_group(feats, num_temporal=NT)
    tmpl = InputTemplate(feats[:, 40:90].copy(), num_temporal=NT)
    sims, _ = sliding_traces(xs, sh_t, sh_s, tmpl, scan_len=200,
                             temp_weight=0.5, max_boost=8.0)
    assert int(np.argmax(sims)) == 40
    assert sims[40] == pytest.approx(1.0, abs=1e-5)


def test_batched_and_long_file_traces_nt2_planted():
    """parallel.sweep paths must thread the template's split too."""
    from strugatzki_tpu.parallel.sweep import (
        batched_correlation_traces, make_files_mesh, pad_stack,
        sharded_long_file_trace)

    rng = np.random.default_rng(22)
    mats = [np.abs(0.5 + 0.2 * rng.standard_normal((6, 180 + 9 * i))
                   ).astype(np.float32) for i in range(8)]
    shifted = [K.shift_per_group(m, num_temporal=NT) for m in mats]
    xs_b, _ = pad_stack([s[0] for s in shifted])
    shifts = np.asarray([s[1] for s in shifted], np.float32)
    tmpl = InputTemplate(mats[2][:, 30:80].copy(), num_temporal=NT)
    sims, _ = batched_correlation_traces(xs_b, shifts, tmpl, 0.5, 8.0)
    assert int(np.argmax(sims[2])) == 30
    assert sims[2, 30] == pytest.approx(1.0, abs=1e-5)
    # sharded variant agrees
    sims_m, _ = batched_correlation_traces(xs_b, shifts, tmpl, 0.5, 8.0,
                                           mesh=make_files_mesh())
    np.testing.assert_allclose(sims_m, sims, atol=1e-6)
    # one long file, time axis sharded: planted self-match at frame 300
    long_feats = np.abs(0.5 + 0.2 * rng.standard_normal((6, 700))).astype(
        np.float32)
    long_xs, lsh_t, _lsh_s = K.shift_per_group(long_feats, num_temporal=NT)
    t2 = InputTemplate(long_feats[:, 300:360].copy(), num_temporal=NT)
    sims_l, _b = sharded_long_file_trace(long_xs, lsh_t, t2, 0.5, 8.0,
                                         make_files_mesh())
    assert sims_l.shape == (700 - 60 + 1,)
    assert int(np.argmax(sims_l)) == 300
    assert sims_l[300] == pytest.approx(1.0, abs=3e-5)


def test_template_split_validation():
    ents = _entries(seed=11)
    db = FeatureDatabase(ents, norm=None, pad_multiple=64, num_temporal=NT)
    t1 = InputTemplate(ents[0][1][:, :40].copy())               # nt=1
    with pytest.raises(ValueError, match="num_temporal"):
        db.query(t1, k=2)
    t2 = InputTemplate(ents[0][1][:, :40].copy(), num_temporal=NT)
    with pytest.raises(ValueError, match="num_temporal"):
        db.query_punch(t2, t1, min_punch=5, max_punch=10)
    with pytest.raises(ValueError, match="num_temporal"):
        db.query_batch([t2, t1])
    with pytest.raises(ValueError, match="num_temporal"):
        db.query_punch_batch([(t2, t1, 5, 10)])
    # channel-count mismatch is caught before any kernel shape error
    db1 = FeatureDatabase(ents, norm=None, pad_multiple=64)
    bad = InputTemplate(ents[0][1][:4, :40].copy())
    with pytest.raises(ValueError, match="channels"):
        db1.query(bad, k=2)


def test_constructor_validation():
    ents = _entries(seed=13, C=4)
    with pytest.raises(ValueError, match="num_temporal"):
        FeatureDatabase(ents, norm=None, num_temporal=0)
    with pytest.raises(ValueError, match="spectral"):
        FeatureDatabase(ents, norm=None, num_temporal=4)


def test_save_load_preserves_num_temporal(tmp_path):
    ents = _entries(seed=15)
    db = FeatureDatabase(ents, norm=None, pad_multiple=64, num_temporal=NT)
    p = tmp_path / "nt.npz"
    db.save(p)
    for kw in ({}, {"raw_store": "memmap"}):
        db2 = FeatureDatabase.load(p, **kw)
        assert db2._num_temporal == NT
        tmpl = InputTemplate(ents[3][1][:, 30:80].copy(), num_temporal=NT)
        res = db2.query(tmpl, k=2)
        assert res.frames[3, 0] == 30

    # add_files / restage keep the split
    db.add_files(_entries(seed=16, n=2, T=130, prefix="g"))
    tmpl = InputTemplate(ents[3][1][:, 30:80].copy(), num_temporal=NT)
    assert db.query(tmpl, k=2).frames[3, 0] == 30
    assert db._num_temporal == NT
