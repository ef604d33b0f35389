"""Host→device transfer staging.

Through the tunneled relay this environment attaches chips with, the
effective wire rate collapses on very large single transfers (3× lower at
96 MB than at ≤48 MB; absolute rates are content-dependent because the
relay compresses — docs/BENCH_LINK.md).  ``staged_put`` splits any upload
into ≤ :data:`STAGE_CHUNK_BYTES` pieces reassembled on device: one extra
device-side copy buys immunity to the cliff.
"""

from __future__ import annotations

from ..runtime.platform import configure as _configure_platform

_configure_platform()   # this module touches the device (staged puts)

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["staged_put", "STAGE_CHUNK_BYTES"]

STAGE_CHUNK_BYTES = 24 << 20


def staged_put(arr: np.ndarray):
    """``device_put`` of ``arr`` in ≤ :data:`STAGE_CHUNK_BYTES` pieces,
    reassembled on device.  Small arrays go straight through."""
    if arr.nbytes <= STAGE_CHUNK_BYTES:
        return jnp.asarray(arr)
    lead = arr.shape[0] if arr.ndim else 1
    row_bytes = max(1, arr.nbytes // max(lead, 1))
    rows_per = max(1, STAGE_CHUNK_BYTES // row_bytes)
    if arr.ndim >= 2 and rows_per < lead and row_bytes <= STAGE_CHUNK_BYTES:
        # per-row pieces only when a row itself fits the chunk budget;
        # otherwise fall through to the flat split so no piece exceeds it
        parts = [jax.device_put(arr[i:i + rows_per])
                 for i in range(0, lead, rows_per)]
        return jnp.concatenate(parts, axis=0)
    flat = arr.reshape(-1)
    k = -(-arr.nbytes // STAGE_CHUNK_BYTES)
    bounds = np.linspace(0, flat.shape[0], k + 1).astype(np.int64)
    parts = [jax.device_put(flat[a:b]) for a, b in zip(bounds, bounds[1:])]
    return jnp.concatenate(parts).reshape(arr.shape)
