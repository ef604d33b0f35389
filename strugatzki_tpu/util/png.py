"""Minimal dependency-free PNG encoder (RGB8), replacing the reference's
``javax.imageio.ImageIO.write(img, "png", file)`` (SelfSimilarityImpl.scala:167)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["write_png", "write_png_rows"]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def write_png_rows(path, height: int, width: int, rows_iter,
                   level: int = 6) -> None:
    """Write an 8-bit RGB PNG from a stream of row bands.

    ``rows_iter`` yields consecutive ``[k, width, 3]`` uint8 arrays (top to
    bottom, summing to ``height`` rows).  Scanlines stream through a zlib
    compressor and out as ~4 MB IDAT chunks, so encoding a 46340²-pixel
    self-similarity image (the reference's extent ceiling,
    SelfSimilarityImpl.scala:81-91) never holds more than one band plus the
    compressor window in memory.
    """
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    comp = zlib.compressobj(level)
    rows_done = 0
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr))
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

        for rows in rows_iter:
            rows = np.ascontiguousarray(rows, dtype=np.uint8)
            if rows.ndim != 3 or rows.shape[2] != 3 or rows.shape[1] != width:
                raise ValueError(f"expected [k, {width}, 3] band, "
                                 f"got {rows.shape}")
            k = rows.shape[0]
            # filter byte 0 (None) before each scanline
            filt = np.concatenate(
                [np.zeros((k, 1), np.uint8),
                 rows.reshape(k, width * 3)], axis=1)
            pending += comp.compress(filt.tobytes())
            flush_idat()
            rows_done += k
        if rows_done != height:
            raise ValueError(f"row stream produced {rows_done} rows, "
                             f"IHDR promised {height}")
        pending += comp.flush()
        flush_idat(force=True)
        f.write(_chunk(b"IEND", b""))


def write_png(path, rgb: np.ndarray) -> None:
    """Write an ``[H, W, 3]`` uint8 array as an 8-bit RGB PNG (row-banded
    through :func:`write_png_rows`)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected [H, W, 3] rgb array, got {rgb.shape}")
    h, w = rgb.shape[:2]
    band = max(1, (1 << 22) // (w * 3 + 1))
    write_png_rows(path, h, w,
                   (rgb[y0:y0 + band] for y0 in range(0, h, band)))
