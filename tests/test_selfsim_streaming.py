"""Streaming self-similarity → PNG: pixel parity with the in-memory path
and bounded memory at the reference's giant extents
(SelfSimilarityImpl.scala:81-91 supports up to 46340 px)."""

import struct
import subprocess
import sys
import zlib

import numpy as np

from strugatzki_tpu.analysis.self_similarity import (render_image,
                                                     self_similarity_matrix,
                                                     self_similarity_to_png)
from strugatzki_tpu.util.png import write_png


def _decode_png(path):
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    # concatenate all IDAT payloads
    data, off = bytearray(), 8
    while off < len(raw):
        (ln,) = struct.unpack(">I", raw[off:off + 4])
        tag = raw[off + 4:off + 8]
        if tag == b"IDAT":
            data += raw[off + 8:off + 8 + ln]
        off += 12 + ln
    pix = zlib.decompress(bytes(data))
    img = np.frombuffer(pix, np.uint8).reshape(h, 1 + w * 3)
    assert (img[:, 0] == 0).all()  # filter byte None
    return img[:, 1:].reshape(h, w, 3)


def test_streamed_png_matches_inmemory(tmp_path):
    rng = np.random.default_rng(11)
    x = np.abs(0.5 + 0.1 * rng.standard_normal((5, 700))).astype(np.float32)
    half_win, decim, tw = 10, 1, 0.5

    sims = self_similarity_matrix(x, x, half_win, decim, tw)
    rgb = render_image(sims, "psycho", 1.2, 0.9, False)
    p_mem = tmp_path / "mem.png"
    p_str = tmp_path / "str.png"
    write_png(p_mem, rgb)
    n = self_similarity_to_png(x, x, half_win, decim, tw, p_str,
                               colors="psycho", color_warp=1.2,
                               color_ceil=0.9, color_inv=False)
    assert n == sims.shape[0] == 700 - 20 + 1
    np.testing.assert_array_equal(_decode_png(p_mem), _decode_png(p_str))


def test_streamed_png_cross_mode_and_gray(tmp_path):
    rng = np.random.default_rng(12)
    x1 = np.abs(0.5 + 0.1 * rng.standard_normal((5, 600))).astype(np.float32)
    x2 = np.abs(0.5 + 0.1 * rng.standard_normal((5, 640))).astype(np.float32)
    half_win, decim, tw = 8, 2, 0.3

    sims = self_similarity_matrix(x1, x2, half_win, decim, tw)
    rgb = render_image(sims, "gray", 1.0, 1.0, True)
    p_mem = tmp_path / "mem.png"
    p_str = tmp_path / "str.png"
    write_png(p_mem, rgb)
    self_similarity_to_png(x1, x2, half_win, decim, tw, p_str,
                           colors="gray", color_inv=True)
    np.testing.assert_array_equal(_decode_png(p_mem), _decode_png(p_str))


_GIANT = r"""
import resource, struct, sys, time
import numpy as np

def rss():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

def vmhwm():
    for ln in open("/proc/self/status"):
        if ln.startswith("VmHWM:"):
            return int(ln.split()[1]) // 1024
    return -1

t00 = time.monotonic()
sys.path.insert(0, {repo!r})
from strugatzki_tpu.analysis.self_similarity import self_similarity_to_png
print(f"phase import: rss={{rss()}}MB vmhwm={{vmhwm()}}MB "
      f"t={{time.monotonic()-t00:.0f}}s", file=sys.stderr)

n = 20001
half_win = 4
rng = np.random.default_rng(0)
x = np.abs(0.5 + 0.1 * rng.standard_normal((2, n + 2 * half_win - 1))) \
    .astype(np.float32)
out = {out!r}
print(f"phase data: rss={{rss()}}MB t={{time.monotonic()-t00:.0f}}s",
      file=sys.stderr)
got = self_similarity_to_png(x, x, half_win, 1, 0.5, out, colors="gray",
                             png_level=1)
print(f"phase render: rss={{rss()}}MB vmhwm={{vmhwm()}}MB "
      f"t={{time.monotonic()-t00:.0f}}s", file=sys.stderr)
assert got == n, got
raw = open(out, "rb").read()
assert raw[:8] == b"\x89PNG\r\n\x1a\n"
w, h = struct.unpack(">II", raw[16:24])
assert (w, h) == (n, n), (w, h)
assert raw[-8:-4] == b"IEND"
# VmHWM, not ru_maxrss: subprocess forks from the pytest parent, whose
# COW footprint (>2 GB late in a suite run — in-process jit executables
# accumulate) is recorded in the child's ru_maxrss before exec; exec
# installs a fresh mm, so VmHWM reflects only this process's own peak
rss_mb = vmhwm()
print(f"extent={{n}} rss={{rss_mb:.0f}}MB file={{len(raw)/1e6:.1f}}MB "
      f"(ru_maxrss={{rss()}}MB incl. the parent fork footprint)")
assert rss_mb < 2048, f"peak rss {{rss_mb:.0f}} MB >= 2 GB"
"""


def test_giant_extent_streams_under_2gb(tmp_path):
    """Render an extent-20001 image (1.6 GB as a float matrix, 1.2 GB as
    RGB — neither may ever exist) in a fresh process and assert peak RSS
    stays under 2 GB."""
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _GIANT.format(repo=repo, out=str(tmp_path / "giant.png"))
    env = dict(os.environ, JAX_PLATFORMS="cpu", STRUGATZKI_PLATFORM="cpu")
    # ~37 s uncontended; the 1-vCPU host can starve this subprocess 10×+
    # when anything else computes concurrently, so the bound is generous
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "rss=" in res.stdout, res.stdout
