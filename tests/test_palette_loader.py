"""Exact-palette drop-in: load_palette / STRUGATZKI_PALETTE install a
verbatim IntensityPalette table (docs/PARITY.md §Transcribed)."""

import numpy as np

from strugatzki_tpu.util import palette as P


def _restore():
    P.reset_palette()


def test_load_palette_verbatim():
    try:
        P.load_palette([0x000000, 0x400080, 0xFF8000, 0xFFFFFF])
        assert P.NUM_COLORS == 4
        assert P.intensity_rgb(0.0) == (0, 0, 0)
        assert P.intensity_rgb(1.0) == (255, 255, 255)
        assert P.intensity_rgb(1.0 / 3.0) == (0x40, 0x00, 0x80)
        out = P.apply_palette(np.array([0.0, 2.0 / 3.0, 1.0]))
        np.testing.assert_array_equal(out[1], [0xFF, 0x80, 0x00])
    finally:
        _restore()


def test_load_palette_file_formats(tmp_path):
    try:
        pj = tmp_path / "pal.json"
        pj.write_text("[0, 65280, 16711680]")
        P._load_palette_file(str(pj))
        assert P.NUM_COLORS == 3
        assert P.intensity_rgb(0.5) == (0, 255, 0)

        ph = tmp_path / "pal.txt"
        ph.write_text("// IntensityPalette.scala seq\n0x000000,\n0x123456,\n0xFFFFFF\n")
        P._load_palette_file(str(ph))
        assert P.NUM_COLORS == 3
        assert P.intensity_rgb(0.5) == (0x12, 0x34, 0x56)
    finally:
        _restore()


def test_contour_table_dropin():
    """load_contour_table installs ML.cpp's verbatim contours[42][11] for
    the 44.1k/1024 config (docs/ML_DERIVATION.md's one unrecoverable
    table) and propagates through cached bases."""
    import numpy as np
    from strugatzki_tpu.dsp import ml_tables as T
    from strugatzki_tpu.dsp.frontend import make_basis

    default = T.contour_table(44100.0, 1024).copy()
    try:
        fake = np.tile(np.linspace(5, 105, 11), (42, 1)) + \
            np.arange(42)[:, None]
        T.load_contour_table(fake)
        got = T.contour_table(44100.0, 1024)
        np.testing.assert_allclose(got[:, 1:], fake[:, 1:])
        assert make_basis(44100.0, 1024, 13).contours_ext[0, 0] == \
            np.float32(fake[0, 0])
        # other configs keep the reconstruction
        other = T.contour_table(44100.0, 2048)
        assert other.shape == (42, 11)
        assert not np.allclose(other, fake)
    finally:
        T.load_contour_table(None)
        np.testing.assert_allclose(T.contour_table(44100.0, 1024), default)


def test_contour_table_transpose_and_validation():
    import numpy as np
    import pytest
    from strugatzki_tpu.dsp import ml_tables as T

    try:
        band_major = np.tile(np.linspace(5, 105, 11), (42, 1)) \
            + np.arange(42)[:, None]
        T.load_contour_table(band_major.T)        # phon-major input
        np.testing.assert_allclose(
            T.contour_table(44100.0, 1024)[:, 1:], band_major[:, 1:])
        with pytest.raises(ValueError):
            T.load_contour_table(np.zeros((7, 7)))
        with pytest.raises(ValueError):
            # scrambled: rows not increasing in dB
            T.load_contour_table(band_major[:, ::-1])
    finally:
        T.load_contour_table(None)


def test_contours_env_var_loads(tmp_path):
    """STRUGATZKI_CONTOURS must load at import (regression: the env hook
    once ran before contour_table was defined)."""
    import subprocess
    import sys

    import numpy as np
    f = tmp_path / "contours.txt"
    np.savetxt(f, np.tile(np.linspace(5, 105, 11), (42, 1))
               + np.arange(42)[:, None])
    import os
    env = dict(os.environ, STRUGATZKI_CONTOURS=str(f),
               STRUGATZKI_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "from strugatzki_tpu.dsp import ml_tables as T;"
         "import numpy as np;"
         "assert T.contour_table(44100.0, 1024)[0, 1] == np.float64(15.0);"
         "print('env-contours ok')"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-1000:]
    assert "env-contours ok" in r.stdout
