"""Multi-chip batch sweeps (the framework's data-parallel layer).

The reference processes database files strictly sequentially on one thread
(FeatureCorrelationImpl.scala:161, README.md:83).  Here the per-file sliding
correlation is *batched* (one leading files axis) and sharded over a
``jax.sharding.Mesh`` axis ``"files"``: each chip computes the dense
(sim, boost) traces and a per-file device top-k for its shard of the
database; the only cross-chip communication is the implicit all-gather when
the small ``[B, K]`` top-k results are fetched — ICI-friendly by
construction (SURVEY §2.3's rebuild decision).

Exact match selection still runs on host over the returned traces (the
reference's priority/collapse semantics are inherently sequential); the
device top-k is used by pipelines that only need best-candidates (bench,
sweep tooling).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels import corr as K

__all__ = ["make_files_mesh", "batched_correlation_traces",
           "sharded_sweep_step", "pad_stack", "sharded_long_file_trace"]


def make_files_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``files``."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names=("files",))


def pad_stack(mats: Sequence[np.ndarray], pad_value: float = 0.0,
              multiple: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Stack ``[C, T_i]`` matrices into ``[B, C, T_max]`` plus lengths."""
    t_max = max(m.shape[1] for m in mats)
    t_max = ((t_max + multiple - 1) // multiple) * multiple
    out = np.full((len(mats), mats[0].shape[0], t_max), pad_value, np.float32)
    lens = np.zeros(len(mats), np.int32)
    for i, m in enumerate(mats):
        out[i, :, :m.shape[1]] = m
        lens[i] = m.shape[1]
    return out, lens


@partial(jax.jit, static_argnames=("num_temporal",))
def _batched_traces(xs_b, tmpl_t, tmpl_s, a_std_t, a_std_s,
                    ln_avg, shifts_t, temp_weight, max_boost,
                    num_temporal: int = 1):
    """vmap of kernels.corr.correlation_trace over the files axis.

    ``xs_b``: ``[B, C, Tp]`` prepared features; ``shifts_t``: ``[B]`` per-file
    temporal shifts.  Returns ``(sims [B, W], boosts [B, W])``.
    """
    def one(xs, shift_t):
        return K.correlation_trace(
            xs, tmpl_t, tmpl_s, a_std_t, a_std_s, ln_avg, shift_t,
            temp_weight, max_boost, num_temporal=num_temporal)

    return jax.vmap(one)(xs_b, shifts_t)


def batched_correlation_traces(xs_b: np.ndarray, shifts_t: np.ndarray,
                               template, temp_weight: float, max_boost: float,
                               mesh: Optional[Mesh] = None):
    """Dense traces for a whole padded batch, optionally sharded over
    ``mesh`` axis ``files``.  ``template`` is an
    ``analysis.correlation.InputTemplate``."""
    args = (jnp.asarray(xs_b),
            jnp.asarray(template.temporal_centered),
            jnp.asarray(template.spectral_centered),
            jnp.float32(template.temporal_std),
            jnp.float32(template.spectral_std),
            jnp.float32(template.ln_avg_loudness),
            jnp.asarray(shifts_t, dtype=jnp.float32),
            jnp.float32(temp_weight), jnp.float32(max_boost))
    if mesh is None:
        sims, boosts = _batched_traces(*args)
    else:
        shard = NamedSharding(mesh, P("files"))
        repl = NamedSharding(mesh, P())
        fn = jax.jit(
            _batched_traces,
            in_shardings=(shard, repl, repl, repl, repl, repl, shard,
                          repl, repl),
            out_shardings=(shard, shard))
        xs_s = jax.device_put(args[0], shard)
        sims, boosts = fn(xs_s, *args[1:])
    return np.asarray(sims), np.asarray(boosts)


def sharded_long_file_trace(xs: np.ndarray, shift_t: float, template,
                            temp_weight: float, max_boost: float,
                            mesh: Mesh) -> Tuple[np.ndarray, np.ndarray]:
    """Correlation trace of ONE very long file, time axis sharded over the
    mesh — the framework's sequence/context-parallel dimension (SURVEY §5's
    ring-buffer streaming analog).

    Window starts are split into contiguous per-chip ranges; each shard
    receives its slab plus the ``L − 1``-frame halo so every window is
    computed locally (no collectives in the hot path — only the trace
    gather on fetch).  Results are bit-comparable to the single-chip trace.

    ``xs``: prepared (normalized, group-shifted) features ``[C, T]``.
    Returns ``(sims[W], boosts[W])``, ``W = T − L + 1``.
    """
    n_dev = mesh.devices.size
    L = template.num_frames
    C, T = xs.shape
    W = T - L + 1
    if W <= 0:
        return np.zeros(0, np.float32), np.zeros(0, np.float32)
    per = -(-W // n_dev)                     # window starts per shard
    slab = per + L - 1                       # samples per shard incl. halo
    slabs = np.zeros((n_dev, C, slab), np.float32)
    for d in range(n_dev):
        s0 = d * per
        src = xs[:, s0:s0 + slab]
        slabs[d, :, :src.shape[1]] = src

    shard = NamedSharding(mesh, P("files"))
    shifts = np.full(n_dev, np.float32(shift_t))
    sims, boosts = _batched_traces(
        jax.device_put(jnp.asarray(slabs), shard),
        jnp.asarray(template.temporal_centered),
        jnp.asarray(template.spectral_centered),
        jnp.float32(template.temporal_std), jnp.float32(template.spectral_std),
        jnp.float32(template.ln_avg_loudness),
        jax.device_put(jnp.asarray(shifts), shard),
        jnp.float32(temp_weight), jnp.float32(max_boost))
    sims = np.asarray(sims).reshape(-1)[:n_dev * per]
    boosts = np.asarray(boosts).reshape(-1)[:n_dev * per]
    return sims[:W].copy(), boosts[:W].copy()


def sharded_sweep_step(mesh: Mesh, num_temporal: int = 1):
    """Build the jitted full sweep step over a mesh: batched extraction-style
    feature prep is assumed done; the step takes a sharded feature batch and
    a replicated template and returns per-file device top-k (values, frame
    indices) — the pattern the 10k-file north-star sweep uses.

    The files axis is sharded; templates are replicated; ``jnp.top_k`` runs
    shard-local and results gather over ICI on fetch.
    """
    shard = NamedSharding(mesh, P("files"))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(shard, repl, repl, repl, repl, repl, shard,
                           shard, repl, repl),
             out_shardings=(shard, shard),
             static_argnames=("k",))
    def step(xs_b, tmpl_t, tmpl_s, a_std_t, a_std_s, ln_avg, shifts_t,
             lens, temp_weight, max_boost, k: int = 4):
        sims, _ = _batched_traces(xs_b, tmpl_t, tmpl_s, a_std_t, a_std_s,
                                  ln_avg, shifts_t, temp_weight, max_boost,
                                  num_temporal=num_temporal)
        # mask windows that extend past each file's true length (the batch
        # is padded to a common T; padded-tail windows are degenerate)
        L = tmpl_t.shape[1]
        w_valid = lens - (L - 1)
        t_idx = jnp.arange(sims.shape[1])[None, :]
        sims = jnp.where(t_idx < w_valid[:, None], sims, -jnp.inf)
        vals, idx = jax.lax.top_k(sims, k)
        return vals, idx

    return step
