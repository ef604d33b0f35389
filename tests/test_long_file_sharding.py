"""Time-axis (sequence-parallel) sharding of a single long file's trace."""

import numpy as np
import jax.numpy as jnp

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.parallel.sweep import (make_files_mesh,
                                           sharded_long_file_trace)


def test_matches_single_chip_trace():
    rng = np.random.default_rng(0)
    x = np.abs(0.5 + 0.1 * rng.standard_normal((14, 3000))).astype(np.float32)
    tmpl = InputTemplate(x[:, 500:620].copy())
    xs, sh, _ = K.shift_per_group(x)

    single_s, single_b = K.correlation_trace(
        jnp.asarray(xs), tmpl.device_temporal(), tmpl.device_spectral(),
        jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
        jnp.float32(tmpl.ln_avg_loudness), jnp.float32(sh),
        jnp.float32(0.5), jnp.float32(8.0))
    single_s, single_b = np.asarray(single_s), np.asarray(single_b)

    mesh = make_files_mesh()
    sh_s, sh_b = sharded_long_file_trace(xs, sh, tmpl, 0.5, 8.0, mesh)
    assert sh_s.shape == single_s.shape
    np.testing.assert_allclose(sh_s, single_s, atol=3e-5)
    np.testing.assert_allclose(sh_b, single_b, rtol=1e-5)
    assert int(np.argmax(sh_s)) == 500


def test_uneven_split():
    rng = np.random.default_rng(1)
    # W = 101 windows over 8 devices: per = 13, last shard partial
    x = np.abs(0.5 + 0.1 * rng.standard_normal((6, 160))).astype(np.float32)
    tmpl = InputTemplate(x[:, 30:90].copy())
    xs, sh, _ = K.shift_per_group(x)
    mesh = make_files_mesh()
    s, b = sharded_long_file_trace(xs, sh, tmpl, 0.5, 8.0, mesh)
    assert len(s) == 160 - 60 + 1
    assert int(np.argmax(s)) == 30


def test_sharded_novelty_matches_single_chip():
    """Time-sharded novelty curve (segmentation's sequence parallelism)
    vs the single-device trace: plan budget, breaks at the same frames."""
    from strugatzki_tpu.parallel.sweep import sharded_long_novelty_trace

    rng = np.random.default_rng(2)
    x = np.abs(0.5 + 0.1 * rng.standard_normal((14, 2500))).astype(np.float32)
    xs, _, _ = K.shift_per_group(x)
    h = 43
    single = np.asarray(K.novelty_trace(jnp.asarray(xs), h,
                                        jnp.float32(0.5)))
    s = sharded_long_novelty_trace(xs, h, 0.5, make_files_mesh())
    assert s.shape == single.shape
    np.testing.assert_allclose(s, single, atol=3e-5)
    assert int(np.argmin(s)) == int(np.argmin(single))

    # uneven split: W = 2500 − 2·43 + 1 = 2415 isn't divisible by 8; also
    # exercise a tiny W < devices edge through the high-level wrapper
    s_small = sharded_long_novelty_trace(xs[:, :90], h, 0.5,
                                         make_files_mesh())
    single_small = np.asarray(K.novelty_trace(jnp.asarray(xs[:, :90]), h,
                                              jnp.float32(0.5)))
    assert s_small.shape == single_small.shape == (90 - 86 + 1,)
    np.testing.assert_allclose(s_small, single_small, atol=3e-5)


def test_segment_features_mesh_matches_breaks():
    """segment_features(mesh=) must return the same break positions as the
    single-device path (sims within the plan budget)."""
    from strugatzki_tpu.analysis.segmentation import segment_features
    from strugatzki_tpu.config import SegmentationConfig

    rng = np.random.default_rng(5)
    f = np.abs(0.5 + 0.1 * rng.standard_normal((14, 1800))).astype(np.float32)
    # plant two novelty discontinuities
    f[:, 600:] += 0.4
    f[:, 1200:] -= 0.35
    cfg = SegmentationConfig(meta_input="x", corr_len=22050, num_breaks=4,
                             min_spacing=22050, normalize=False).build()
    base = segment_features(f, None, 512, cfg)
    sharded = segment_features(f, None, 512, cfg, mesh=make_files_mesh())
    assert [b.pos for b in sharded] == [b.pos for b in base]
    for a, b in zip(sharded, base):
        assert abs(a.sim - b.sim) < 2e-5


def test_sharded_extract_long_matches_sequential():
    """Time-sharded extraction (context parallelism for the DSP front-end)
    must reproduce the sequential pipeline: the one-frame excitation halo
    seeds each shard's temporal-masking carry exactly."""
    from strugatzki_tpu.dsp.frontend import extract_features
    from strugatzki_tpu.parallel.sweep import (make_files_mesh,
                                               sharded_extract_long)

    rng = np.random.default_rng(3)
    mesh = make_files_mesh()
    x = (0.3 * rng.standard_normal(44100 * 5)).astype(np.float32)
    f_sp = sharded_extract_long(x, 44100.0, mesh)
    f_seq = extract_features(x, 44100.0)
    assert f_sp.shape == f_seq.shape
    np.testing.assert_allclose(f_sp[0], f_seq[0], atol=2e-5)
    np.testing.assert_allclose(f_sp[1:], f_seq[1:], atol=2e-5)

    # int16 raw path and a non-divisible frame count
    xi = np.clip(np.round(x[: 44100 * 3 + 777] * 32768), -32768, 32767) \
        .astype(np.int16)
    f_sp = sharded_extract_long(xi, 44100.0, mesh)
    f_seq = extract_features(xi, 44100.0)
    assert f_sp.shape == f_seq.shape
    np.testing.assert_allclose(f_sp, f_seq, atol=2e-5)


def test_sharded_extract_long_threads_masks():
    """Non-default smask/tmask must thread through to the device consts
    (regression: the sharded path hardcoded the defaults, silently
    diverging from extract_features(smask=, tmask=))."""
    from strugatzki_tpu.dsp.frontend import extract_features
    from strugatzki_tpu.parallel.sweep import (make_files_mesh,
                                               sharded_extract_long)

    rng = np.random.default_rng(4)
    mesh = make_files_mesh()
    x = (0.3 * rng.standard_normal(44100 * 2)).astype(np.float32)
    f_sp = sharded_extract_long(x, 44100.0, mesh, smask=0.5, tmask=0.7)
    f_seq = extract_features(x, 44100.0, smask=0.5, tmask=0.7)
    assert f_sp.shape == f_seq.shape
    np.testing.assert_allclose(f_sp, f_seq, atol=2e-5)
    f_def = extract_features(x, 44100.0)
    assert not np.allclose(f_sp, f_def, atol=2e-5)   # the masks must matter


def test_sharded_extract_long_rejects_feedback_form(monkeypatch):
    """The one-halo-frame carry trick is only valid for the shipped
    prev_frame masking form; the recursive feedback hypothesis form must
    fail loud instead of silently diverging after each shard boundary."""
    import pytest

    import strugatzki_tpu.dsp.frontend as FE
    from strugatzki_tpu.parallel.sweep import (make_files_mesh,
                                               sharded_extract_long)

    monkeypatch.setattr(FE.C, "TMASK_FORM", "feedback")
    with pytest.raises(NotImplementedError, match="prev_frame"):
        sharded_extract_long(np.zeros(44100, np.float32), 44100.0,
                             make_files_mesh())
