"""Minimal dependency-free PNG encoder (RGB8), replacing the reference's
``javax.imageio.ImageIO.write(img, "png", file)`` (SelfSimilarityImpl.scala:167)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["write_png"]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def write_png(path, rgb: np.ndarray) -> None:
    """Write an ``[H, W, 3]`` uint8 array as an 8-bit RGB PNG.

    Scanlines stream through a zlib compressor in row bands, so encoding a
    46340²-pixel self-similarity image (the reference's extent ceiling,
    SelfSimilarityImpl.scala:81-91) never materializes a second copy of the
    6.4 GB raster.
    """
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected [H, W, 3] rgb array, got {rgb.shape}")
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    comp = zlib.compressobj(6)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr))
        # accumulate compressed bytes and flush as IDAT chunks of ~4 MB
        pending = bytearray()

        def flush_idat(force=False):
            nonlocal pending
            while len(pending) >= (1 << 22) or (force and pending):
                piece = bytes(pending[:1 << 22])
                del pending[:1 << 22]
                f.write(struct.pack(">I", len(piece)) + b"IDAT" + piece
                        + struct.pack(">I",
                                      zlib.crc32(piece, zlib.crc32(b"IDAT"))
                                      & 0xFFFFFFFF))

        band = max(1, (1 << 22) // (w * 3 + 1))
        zero = np.zeros((band, 1), np.uint8)
        for y0 in range(0, h, band):
            rows = rgb[y0:y0 + band]
            filt = np.concatenate([zero[:rows.shape[0]],
                                   rows.reshape(rows.shape[0], w * 3)], axis=1)
            pending += comp.compress(filt.tobytes())
            flush_idat()
        pending += comp.flush()
        flush_idat(force=True)
        f.write(_chunk(b"IEND", b""))
