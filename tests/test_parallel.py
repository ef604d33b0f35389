"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.parallel.sweep import (batched_correlation_traces,
                                           make_files_mesh, pad_stack,
                                           sharded_sweep_step)


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(0)
    files = [np.abs(0.5 + 0.1 * rng.standard_normal((14, 80 + 16 * i)))
             .astype(np.float32) for i in range(16)]
    tmpl = InputTemplate(files[3][:, 20:50].copy())
    prepared, shifts = [], []
    for f in files:
        xs, sh, _ = K.shift_per_group(f)
        prepared.append(xs)
        shifts.append(sh)
    xs_b, lens = pad_stack(prepared)
    return files, tmpl, xs_b, np.asarray(shifts, np.float32), lens


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_traces_match_unsharded(db):
    files, tmpl, xs_b, shifts, lens = db
    s0, b0 = batched_correlation_traces(xs_b, shifts, tmpl, 0.5, 8.0,
                                        mesh=None)
    mesh = make_files_mesh()
    s1, b1 = batched_correlation_traces(xs_b, shifts, tmpl, 0.5, 8.0,
                                        mesh=mesh)
    np.testing.assert_allclose(s0, s1, atol=1e-6)
    np.testing.assert_allclose(b0, b1, rtol=1e-6)


def test_sharded_traces_uneven_batch(db):
    """A batch that doesn't divide the device count must pad-and-trim
    like batched_novelty_traces, not crash in device_put (regression:
    B=6 over 8 devices raised 'should be divisible by 8')."""
    files, tmpl, xs_b, shifts, lens = db
    s0, b0 = batched_correlation_traces(xs_b[:6], shifts[:6], tmpl,
                                        0.5, 8.0, mesh=None)
    s1, b1 = batched_correlation_traces(xs_b[:6], shifts[:6], tmpl,
                                        0.5, 8.0, mesh=make_files_mesh())
    assert s1.shape == s0.shape and s1.shape[0] == 6
    np.testing.assert_allclose(s0, s1, atol=2e-5)
    np.testing.assert_allclose(b0, b1, rtol=2e-5)


def test_sharded_sweep_step_cached():
    """Rebuilding the step for the same (mesh devices, num_temporal) must
    return the SAME jitted callable — a fresh jax.jit closure per call
    would recompile the large correlation program every rebuild."""
    mesh = make_files_mesh()
    assert sharded_sweep_step(mesh) is sharded_sweep_step(mesh)
    assert sharded_sweep_step(mesh) is not sharded_sweep_step(
        mesh, num_temporal=2)
    assert sharded_sweep_step(mesh) is sharded_sweep_step(make_files_mesh())


def test_batched_matches_per_file_trace(db):
    files, tmpl, xs_b, shifts, lens = db
    sims_b, boosts_b = batched_correlation_traces(xs_b, shifts, tmpl,
                                                  0.5, 8.0)
    L = tmpl.num_frames
    for i in (0, 3, 7):
        xs, sh, sh_s = K.shift_per_group(files[i])
        sims, boosts = K.correlation_trace(
            jnp.asarray(xs), jnp.asarray(tmpl.temporal_centered),
            jnp.asarray(tmpl.spectral_centered),
            jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
            jnp.float32(tmpl.ln_avg_loudness), jnp.float32(sh),
            jnp.float32(0.5), jnp.float32(8.0))
        w = files[i].shape[1] - L + 1
        np.testing.assert_allclose(np.asarray(sims)[:w], sims_b[i, :w],
                                   atol=1e-5)


def test_sharded_sweep_step_topk(db):
    files, tmpl, xs_b, shifts, lens = db
    mesh = make_files_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = NamedSharding(mesh, P("files"))
    step = sharded_sweep_step(mesh)
    vals, idx = step(
        jax.device_put(jnp.asarray(xs_b), shard),
        jnp.asarray(tmpl.temporal_centered),
        jnp.asarray(tmpl.spectral_centered),
        jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
        jnp.float32(tmpl.ln_avg_loudness),
        jax.device_put(jnp.asarray(shifts), shard),
        jax.device_put(jnp.asarray(lens), shard),
        jnp.float32(0.5), jnp.float32(8.0))
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert vals.shape == (16, 4)
    # file 3 contains the template at offset 20
    assert idx[3, 0] == 20
    assert abs(vals[3, 0] - 1.0) < 1e-3
