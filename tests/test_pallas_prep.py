"""Fused DB-preparation kernel: Pallas (interpret mode on CPU) vs XLA
fallback vs the host reference path."""

import numpy as np
import jax.numpy as jnp

from strugatzki_tpu.analysis.common import normalized
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.kernels.pallas_prep import (prepare_database,
                                                prepare_database_xla)


def _batch(seed=0, B=5, C=6, T=200):
    rng = np.random.default_rng(seed)
    feats = np.abs(0.5 + 0.2 * rng.standard_normal((B, C, T))).astype(np.float32)
    lens = np.array([T, T - 13, T - 50, 77, T], np.int32)
    for i, n in enumerate(lens):
        feats[i, :, n:] = 0.0
    norm = np.stack([feats.min(axis=(0, 2)) - 0.01,
                     feats.max(axis=(0, 2)) + 0.01], axis=1).astype(np.float32)
    return feats, lens, norm


def test_pallas_matches_xla():
    feats, lens, norm = _batch()
    out_p, sh_p = prepare_database(feats, norm, lens, interpret=True)
    out_x, sh_x = prepare_database_xla(jnp.asarray(feats), jnp.asarray(norm),
                                       jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_p), np.asarray(sh_x), atol=1e-6)


def test_device_prep_equivalent_to_host_prep():
    """Device prep must yield the same downstream correlations as the host
    normalize+shift path (shifts may differ in f32 rounding — correlation is
    invariant to the shift constant, boost reconstructs via mu+shift)."""
    feats, lens, norm = _batch(seed=3)
    out, shifts = prepare_database(feats, norm, lens, interpret=True)
    out, shifts = np.asarray(out), np.asarray(shifts)

    from strugatzki_tpu.analysis.correlation import InputTemplate

    i = 1
    n = int(lens[i])
    host_x = normalized(feats[i, :, :n], norm)
    tmpl = InputTemplate(host_x[:, 10:60].copy())
    xs_host, sh_host, _ = K.shift_per_group(host_x)

    sims_host, boosts_host = K.correlation_trace(
        jnp.asarray(xs_host), tmpl.device_temporal(), tmpl.device_spectral(),
        jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
        jnp.float32(tmpl.ln_avg_loudness), jnp.float32(sh_host),
        jnp.float32(0.5), jnp.float32(8.0))
    sims_dev, boosts_dev = K.correlation_trace(
        jnp.asarray(out[i, :, :n]), tmpl.device_temporal(),
        tmpl.device_spectral(),
        jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
        jnp.float32(tmpl.ln_avg_loudness), jnp.float32(shifts[i]),
        jnp.float32(0.5), jnp.float32(8.0))
    w = n - 50 + 1
    np.testing.assert_allclose(np.asarray(sims_dev)[:w],
                               np.asarray(sims_host)[:w], atol=3e-5)
    np.testing.assert_allclose(np.asarray(boosts_dev)[:w],
                               np.asarray(boosts_host)[:w], rtol=1e-4)


def test_none_norm_identity():
    feats, lens, _ = _batch(seed=5)
    out, _ = prepare_database(feats, None, lens, interpret=True)
    # identity normalization: output = feats - group shift, per file
    i, n = 0, int(lens[0])
    xs_host, _, _ = K.shift_per_group(feats[i, :, :n])
    np.testing.assert_allclose(np.asarray(out)[i, :, :n], xs_host, atol=1e-5)
