"""Pallas TPU kernel: fused feature-database preparation.

Staging a database for resident serving requires, per file:

1. per-channel min/max normalization (MathUtil.scala:132-152 semantics,
   unclipped, inf/NaN on degenerate ranges),
2. subtracting a per-group constant (≈ the group mean) so downstream f32
   window sums are cancellation-free (see kernels/corr.py), and
3. remembering the temporal shift for the loudness-boost reconstruction.

Done on host this is three NumPy passes over the whole database (gigabytes
for the 10k-file target); on device the group shifts come from one cheap
XLA reduction pass and the normalize+shift rewrite is a single fused HBM
pass (this kernel), one grid step per file.  Correctness note: Pearson
correlation is invariant to *any* per-group constant, so the device's f32
mean needs no f64 parity with the host version — the shift cancels exactly
in the math and ``μ + shift`` reconstructs the true window mean to f32
rounding either way.

The shifts travel INTO the kernel as scalar-prefetch SMEM arrays: an
earlier revision emitted them as a ``[B, 1]`` SMEM *output* window, whose
(8, 128) tiling pads to ``B×512`` bytes and blows the ~1 MB SMEM budget
around 2k files (found staging a real 10k-file database).

Falls back to a plain-XLA implementation off-TPU (CPU tests, interpret).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["prepare_database", "prepare_database_xla"]


def _prep_kernel(lens_ref, shift_t_ref, shift_s_ref, feats_ref, norm_ref,
                 out_ref, *, num_temporal: int):
    """One grid step = one file: normalize and group-shift.

    feats_ref: [1, C, T] VMEM block; norm_ref: [C, 2] (min, max) replicated;
    lens_ref / shift_*_ref: scalar-prefetched per-file values [B] (SMEM).
    """
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    x = feats_ref[0]                                     # [C, T]
    mins = norm_ref[:, 0:1]
    rng = norm_ref[:, 1:2] - mins
    y = (x - mins) / rng                                 # unclipped, like ref

    n = lens_ref[b]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, dimension=1)
    valid = t_idx < n

    # group membership as masks (Mosaic dislikes sublane-misaligned row
    # slices; masked full-array ops lower cleanly)
    nt = num_temporal
    c_idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, dimension=0)
    # select, not an arithmetic blend: a NaN/inf shift in one group (e.g. a
    # degenerate norm range in the loudness channel) must not poison the
    # other group via 0·inf — the XLA fallback keeps them separate too
    shift_rows = jnp.where(c_idx < nt, shift_t_ref[b], shift_s_ref[b])

    # padded tail must not hold inf/NaN (it would poison FFT traces): the
    # valid windows never read it, so write the shift-consistent constant
    out_ref[0] = jnp.where(valid, y, 0.0) - shift_rows


def _supports_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _one_normalized_shifts(x, n, norm, nt: int):
    """Shared per-file math of both device paths: normalized features,
    valid-frame mask, and the two masked group-mean shifts — one
    definition so the Pallas and XLA paths cannot drift."""
    mins = norm[:, 0:1]
    rng = norm[:, 1:2] - mins
    y = (x - mins) / rng
    t_idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    valid = t_idx < n
    yt = jnp.where(valid[:nt], y[:nt], 0.0)
    ys = jnp.where(valid[nt:], y[nt:], 0.0)
    shift_t = yt.sum() / jnp.maximum(n * nt, 1).astype(jnp.float32)
    shift_s = ys.sum() / jnp.maximum(
        n * (y.shape[0] - nt), 1).astype(jnp.float32)
    return y, valid, shift_t, shift_s


@partial(jax.jit, static_argnames=("num_temporal",))
def _group_shifts(feats: jnp.ndarray, norm: jnp.ndarray, lens: jnp.ndarray,
                  num_temporal: int = 1):
    """Per-file masked group means of the normalized features
    (``(shift_t [B], shift_s [B])``) — one cheap XLA reduction pass."""
    def one(x, n):
        _, _, shift_t, shift_s = _one_normalized_shifts(
            x, n, norm, num_temporal)
        return shift_t, shift_s

    return jax.vmap(one)(feats, lens)


@partial(jax.jit, static_argnames=("num_temporal",))
def prepare_database_xla(feats: jnp.ndarray, norm: jnp.ndarray,
                         lens: jnp.ndarray, num_temporal: int = 1):
    """XLA fallback: identical math, vmapped over files."""
    nt = num_temporal

    def one(x, n):
        y, valid, shift_t, shift_s = _one_normalized_shifts(x, n, norm, nt)
        out = jnp.concatenate([y[:nt] - shift_t, y[nt:] - shift_s], axis=0)
        out = jnp.where(valid, out, jnp.concatenate(
            [jnp.full_like(y[:nt], -shift_t),
             jnp.full_like(y[nt:], -shift_s)], axis=0))
        return out.astype(jnp.float32), shift_t

    return jax.vmap(one)(feats, lens)


def prepare_database(feats, norm, lens, num_temporal: int = 1,
                     interpret: bool = False, sharding=None):
    """[B, C, T] raw features (+[C,2] norm, [B] lengths) → (prepared [B,C,T],
    temporal shifts [B]), all on device.  ``norm`` may be None (identity).

    ``interpret=True`` forces the Pallas kernel in interpreter mode (used by
    CPU tests to validate the kernel itself).

    ``sharding`` (a files-axis :class:`NamedSharding`; ``B`` must divide
    evenly) places the batch sharded over a mesh and routes through the
    XLA formulation — the vmapped prep partitions SPMD, whereas the Pallas
    grid is a single-device program."""
    if sharding is not None:
        # shard straight from host memory — an eager jnp.asarray would
        # commit the whole stack to device 0 first and pay a device→device
        # reshard on top of the upload (parallel/sweep.py keeps the same
        # discipline for its trace operands)
        feats = jax.device_put(np.asarray(feats, dtype=np.float32), sharding)
    else:
        feats = jnp.asarray(feats, dtype=jnp.float32)
    B, C, T = feats.shape
    if norm is None:
        norm_arr = jnp.concatenate(
            [jnp.zeros((C, 1), jnp.float32), jnp.ones((C, 1), jnp.float32)],
            axis=1)
    else:
        norm_arr = jnp.asarray(norm, dtype=jnp.float32)
    if sharding is not None:
        lens = jax.device_put(np.asarray(lens, dtype=np.int32), sharding)
        return prepare_database_xla(feats, norm_arr, lens,
                                    num_temporal=num_temporal)
    lens = jnp.asarray(lens, dtype=jnp.int32)

    # pallas path needs the per-file block resident in VMEM (~16 MB/core;
    # the pipelined grid double-buffers input AND output blocks plus a few
    # [C, T] temporaries, so budget ~6x the block)
    if not interpret and (not _supports_pallas()
                          or C * T * 4 > 2 * 1024 * 1024):
        return prepare_database_xla(feats, norm_arr, lens,
                                    num_temporal=num_temporal)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shift_t, shift_s = _group_shifts(feats, norm_arr, lens,
                                     num_temporal=num_temporal)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # lens, shift_t, shift_s
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, T), lambda b, *pf: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2), lambda b, *pf: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, T), lambda b, *pf: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_prep_kernel, num_temporal=num_temporal),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, T), jnp.float32),
        interpret=interpret,
    )(lens, shift_t, shift_s, feats, norm_arr)
    return out, shift_t
