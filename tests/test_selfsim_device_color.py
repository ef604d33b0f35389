"""Device colorization fast path (colorWarp == 1): bit-exact pixels vs the
host float32 colorize, across schemes, inversion, ceil, and NaN/inf sims."""

import zlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strugatzki_tpu.analysis.self_similarity import (
    _apply_pix_stages, _colorize, _device_pix, _pix_to_rgb, render_image,
    self_similarity_image, self_similarity_matrix)


def _epilogue_rgb(sims, colors, ceil, inv):
    """Run the staged device epilogue on raw sims and expand to RGB."""
    pix = _device_pix(colors, 1.0, ceil, inv)
    assert pix is not None
    return _pix_to_rgb(np.asarray(_apply_pix_stages(jnp.asarray(sims), pix)),
                       pix[2])


@pytest.mark.parametrize("colors", ["psycho", "gray"])
@pytest.mark.parametrize("inv", [False, True])
@pytest.mark.parametrize("ceil", [1.0, 0.8, 1.3])
@pytest.mark.parametrize("chunk", [0, 1, 2])
def test_epilogue_matches_host_colorize(colors, inv, ceil, chunk):
    # deterministic seed (hash() is PYTHONHASHSEED-randomized per process,
    # which made a failure of this test irreproducible across runs)
    seed = zlib.crc32(f"{colors}|{inv}|{ceil}|{chunk}".encode())
    rng = np.random.default_rng(seed)
    sims = rng.uniform(-0.5, 1.6, size=(64, 64)).astype(np.float32)
    # adversarial values: exact palette-bin boundaries, NaN, ±inf, 0, 1,
    # and the round-to-even tie 1 − s·(1/1.3) that exposed the in-kernel
    # FMA contraction (s = 0x3ec2709d/0.76923078 → exact midpoint)
    sims[0, :9] = [np.nan, np.inf, -np.inf, 0.0, 1.0, 0.5,
                   511.5 / 1023.0, 0.25, np.float32(0.49369505)]
    got = _epilogue_rgb(sims, colors, ceil, inv)
    want = _colorize(sims, colors, 1.0, ceil, inv)
    np.testing.assert_array_equal(got, want)


def test_epilogue_fma_tie_regression():
    """The exact datasets where the fused (single-dispatch) epilogue
    diverged: products landing on round-to-even ties at colorCeil 1.3 +
    colorInv (found by a 300-seed sweep; the staged epilogue must match
    the host on every one)."""
    for seed in (49, 145, 184, 206):
        rng = np.random.default_rng(seed)
        sims = rng.uniform(-0.5, 1.6, size=(64, 64)).astype(np.float32)
        got = _epilogue_rgb(sims, "psycho", 1.3, True)
        want = _colorize(sims, "psycho", 1.0, 1.3, True)
        np.testing.assert_array_equal(got, want)


def test_device_pix_gates():
    assert _device_pix("psycho", 1.0, 1.0, False) is not None
    assert _device_pix("gray", 1.0, 0.7, True) is not None
    # pow is not ulp-identical across backends -> host fallback
    assert _device_pix("psycho", 1.2, 1.0, False) is None


@pytest.mark.parametrize("colors,inv", [("psycho", False), ("gray", True)])
def test_image_fast_path_equals_host_render(colors, inv):
    rng = np.random.default_rng(7)
    x = np.abs(0.5 + 0.1 * rng.standard_normal((5, 700))).astype(np.float32)
    half_win, decim, tw = 10, 1, 0.5
    img = self_similarity_image(x, x, half_win, decim, tw, colors,
                                1.0, 0.9, inv)
    sims = self_similarity_matrix(x, x, half_win, decim, tw)
    want = render_image(sims, colors, 1.0, 0.9, inv)
    np.testing.assert_array_equal(img, want)


def test_image_warp_fallback_equals_host_render():
    rng = np.random.default_rng(8)
    x = np.abs(0.5 + 0.1 * rng.standard_normal((4, 300))).astype(np.float32)
    img = self_similarity_image(x, x, 6, 1, 0.4, "psycho", 1.2, 0.9, False)
    sims = self_similarity_matrix(x, x, 6, 1, 0.4)
    want = render_image(sims, "psycho", 1.2, 0.9, False)
    np.testing.assert_array_equal(img, want)


def test_image_cross_mode_fast_path():
    rng = np.random.default_rng(9)
    x1 = np.abs(0.5 + 0.1 * rng.standard_normal((5, 600))).astype(np.float32)
    x2 = np.abs(0.5 + 0.1 * rng.standard_normal((5, 640))).astype(np.float32)
    img = self_similarity_image(x1, x2, 8, 2, 0.3, "psycho", 1.0, 1.0, False)
    sims = self_similarity_matrix(x1, x2, 8, 2, 0.3)
    want = render_image(sims, "psycho", 1.0, 1.0, False)
    np.testing.assert_array_equal(img, want)
