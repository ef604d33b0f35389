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
