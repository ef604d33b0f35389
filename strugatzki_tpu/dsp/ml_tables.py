"""Tables for the SuperCollider ``Loudness.kr`` UGen transcription.

The reference's loudness channel is produced by Nick Collins' ``Loudness``
UGen from SuperCollider's machine-listening plugin file ``server/plugins/
ML.cpp`` (invoked at reference impl/FeatureExtractionImpl.scala:52,
attribution README.md:79).  That UGen is an MP3-style perceptual model:

    FFT power → 42 ERB-spaced band intensities → dB → spectral masking
    (``smask``) → temporal masking (``tmask``) → equal-loudness-contour
    correction (dB → phon, per band) → phon → sone → Σ over bands

This module freezes the tables that parameterize it.  Provenance and
per-constant confidence are documented in docs/ML_DERIVATION.md; in brief:

* ``EQL_BAND_BINS`` — the FFT-bin partition of the 42 ERB bands for the
  44.1 kHz / FFT-1024 configuration, transcribed from ML.cpp's
  ``eqlbandbins`` table.  It is exactly reproduced by the rule
  ``bin_k = max(prev + 1, ceil(bin(E = k)))`` on the Glasberg–Moore ERB
  scale ``E(f) = 21.4·log10(1 + 0.00437·f)`` (verified entry-for-entry by
  :func:`erb_band_edges`), which is also used to generalize the partition
  to other sample rates / FFT sizes the way ML.cpp cannot.
* ``PHONS`` — the 11 loudness levels at which ML.cpp tabulates its
  equal-loudness contours (``static float phons[11]``).
* The contour *values* (``contours[42][11]`` in ML.cpp) are rebuilt from
  the ISO 226:2003 equal-loudness standard evaluated at the 42 band-centre
  frequencies — the exact numbers in ML.cpp are not recoverable in this
  sandbox, but ISO-226 is the published data the model tabulates, it is
  anchored the same way (phon ≡ dB SPL at 1 kHz, which the reference's
  boost estimator measurably relies on: notes/BoostFactor.txt reports 0%
  error at 1 kHz), and any residual difference is a few dB of band-level
  shading at extreme levels.
"""

from __future__ import annotations

import os
import sys
from functools import lru_cache

import numpy as np

__all__ = [
    "ERB_BANDS", "PHONS", "EQL_BAND_BINS_44100_1024", "erb_band_edges",
    "band_centers_hz", "iso226_spl", "contour_table", "load_contour_table",
]

#: Number of ERB-spaced loudness bands (ML.cpp uses a fixed 42).
ERB_BANDS = 42

#: The 11 loudness levels (phon) of the contour table
#: (ML.cpp ``static float phons[11]``).
PHONS = np.array([2.0, 10.0, 20.0, 30.0, 40.0, 50.0,
                  60.0, 70.0, 80.0, 90.0, 100.0])

#: ML.cpp ``static int eqlbandbins[43]`` — for sample rate 44100, FFT 1024
#: (513 rfft bins): band k sums power over bins
#: ``[EQL_BAND_BINS[k], EQL_BAND_BINS[k+1])``.  Band 0 starts at bin 1, so
#: DC never contributes; the final edge 513 is the exclusive end past the
#: Nyquist bin.  (ML.cpp pairs this with ``eqlbandsizes[42]`` holding the
#: same information as consecutive differences.)
EQL_BAND_BINS_44100_1024 = np.array([
    1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 13, 15, 17, 19, 22, 25, 28, 32, 36,
    41, 46, 52, 58, 65, 73, 82, 92, 103, 116, 129, 144, 161, 180, 201,
    225, 251, 280, 312, 348, 388, 433, 483, 513], dtype=np.int64)

# Glasberg & Moore (1990) ERB scale constants (the scale under ML.cpp's
# band table — see module docstring).
_ERB_A = 21.4
_ERB_B = 0.00437


def _erb_of_hz(f):
    return _ERB_A * np.log10(1.0 + _ERB_B * np.asarray(f, np.float64))


def _hz_of_erb(e):
    return (10.0 ** (np.asarray(e, np.float64) / _ERB_A) - 1.0) / _ERB_B


@lru_cache(maxsize=16)
def erb_band_edges(sample_rate: float, fft_size: int) -> np.ndarray:
    """43 FFT-bin edges of the 42 loudness bands.

    Reproduces ML.cpp's ``eqlbandbins`` exactly for (44100, 1024) from the
    ERB rule ``bin_k = max(prev + 1, ceil(f(E=k) / binwidth))`` with the
    final edge clamped to the bin past Nyquist; for other configurations it
    generalizes the same rule (the UGen itself is hard-coded to
    44.1 kHz / 1024 — a documented limitation this rebuild lifts).
    """
    binw = sample_rate / fft_size
    nbins = fft_size // 2 + 1
    edges = np.empty(ERB_BANDS + 1, np.int64)
    prev = 0
    for k in range(ERB_BANDS):
        b = int(np.ceil(_hz_of_erb(k + 1.0) / binw))
        b = max(b, prev + 1)
        edges[k] = b
        prev = b
    edges[ERB_BANDS] = nbins
    # keep edges within range for tiny FFTs: clamp and dedupe upward
    edges = np.minimum(edges, nbins)
    for k in range(1, ERB_BANDS + 1):
        edges[k] = max(edges[k], min(edges[k - 1] + 1, nbins))
    if (sample_rate, fft_size) == (44100.0, 1024):
        assert np.array_equal(edges, EQL_BAND_BINS_44100_1024)
    return edges


def band_centers_hz(sample_rate: float, fft_size: int) -> np.ndarray:
    """Band-centre frequencies: band k spans ERB numbers [k+1, k+2] (its bin
    edges are at E=k+1 and E=k+2), so the centre is the ERB midpoint
    E = k + 1.5 mapped back to Hz."""
    del sample_rate, fft_size  # centres are scale-defined, not bin-defined
    return _hz_of_erb(np.arange(ERB_BANDS, dtype=np.float64) + 1.5)


# ---------------------------------------------------------------------------
# ISO 226:2003 equal-loudness contours
# ---------------------------------------------------------------------------

#: ISO 226:2003 tabulated frequencies (Hz) and parameters α_f, L_U, T_f.
_ISO_F = np.array([
    20.0, 25.0, 31.5, 40.0, 50.0, 63.0, 80.0, 100.0, 125.0, 160.0, 200.0,
    250.0, 315.0, 400.0, 500.0, 630.0, 800.0, 1000.0, 1250.0, 1600.0,
    2000.0, 2500.0, 3150.0, 4000.0, 5000.0, 6300.0, 8000.0, 10000.0,
    12500.0])
_ISO_ALPHA = np.array([
    0.532, 0.506, 0.480, 0.455, 0.432, 0.409, 0.387, 0.367, 0.349, 0.330,
    0.315, 0.301, 0.288, 0.276, 0.267, 0.259, 0.253, 0.250, 0.246, 0.244,
    0.243, 0.243, 0.243, 0.242, 0.242, 0.245, 0.254, 0.271, 0.301])
_ISO_LU = np.array([
    -31.6, -27.2, -23.0, -19.1, -15.9, -13.0, -10.3, -8.1, -6.2, -4.5,
    -3.1, -2.0, -1.1, -0.4, 0.0, 0.3, 0.5, 0.0, -2.7, -4.1, -1.0, 1.7,
    2.5, 1.2, -2.1, -7.1, -11.2, -10.7, -3.1])
_ISO_TF = np.array([
    78.5, 68.7, 59.5, 51.1, 44.0, 37.5, 31.5, 26.5, 22.1, 17.9, 14.4,
    11.4, 8.6, 6.2, 4.4, 3.0, 2.2, 2.4, 3.5, 1.7, -1.3, -4.2, -6.0, -5.4,
    -1.5, 6.0, 12.6, 13.9, 12.3])


def iso226_spl(freq_hz, phon) -> np.ndarray:
    """Sound pressure level (dB SPL) of the ``phon`` equal-loudness contour
    at ``freq_hz`` per ISO 226:2003 §4.1.  Frequencies are clamped to the
    standard's 20 Hz – 12.5 kHz tabulation (flat extension above — the top
    two loudness bands sit beyond the standard's range); parameters are
    interpolated linearly in log-frequency.  Exactly anchored at 1 kHz:
    SPL(1000, P) = P."""
    f = np.clip(np.asarray(freq_hz, np.float64), _ISO_F[0], _ISO_F[-1])
    lf = np.log10(f)
    lx = np.log10(_ISO_F)
    alpha = np.interp(lf, lx, _ISO_ALPHA)
    lu = np.interp(lf, lx, _ISO_LU)
    tf = np.interp(lf, lx, _ISO_TF)
    ln = np.asarray(phon, np.float64)
    a_f = (4.47e-3 * (10.0 ** (0.025 * ln) - 1.15)
           + (0.4 * 10.0 ** ((tf + lu) / 10.0 - 9.0)) ** alpha)
    return 10.0 / alpha * np.log10(np.maximum(a_f, 1e-30)) - lu + 94.0


#: verbatim ``contours[42][11]`` override (see :func:`load_contour_table`)
_EXACT_CONTOURS: "np.ndarray | None" = None


def load_contour_table(values) -> None:
    """Install ML.cpp's verbatim ``contours[42][11]`` table for the
    44.1 kHz / FFT-1024 configuration — the drop-in for a source-check
    session (docs/ML_DERIVATION.md: the one table not reconstructible
    offline).  Accepts band-major ``[42, 11]`` (ML.cpp's layout) or
    phon-major ``[11, 42]`` (transposed automatically; contour rows must
    be increasing in dB, which disambiguates the two).  The same
    monotonicity/audibility conditioning as the built-in reconstruction is
    applied.  Pass ``None`` to revert."""
    global _EXACT_CONTOURS
    contour_table.cache_clear()
    fe = sys.modules.get("strugatzki_tpu.dsp.frontend")
    if fe is not None:  # drop cached bases built from the old table
        fe.make_basis.cache_clear()
        fe._device_consts.cache_clear()
    if values is None:
        _EXACT_CONTOURS = None
        return
    arr = np.asarray(values, np.float64)
    if arr.shape == (len(PHONS), ERB_BANDS):
        arr = arr.T
    elif arr.size == ERB_BANDS * len(PHONS) and arr.ndim <= 1:
        arr = arr.reshape(ERB_BANDS, len(PHONS))
    if arr.shape != (ERB_BANDS, len(PHONS)):
        raise ValueError(
            f"contour table must be [{ERB_BANDS}, {len(PHONS)}] "
            f"(band-major) or its transpose, got {arr.shape}")
    if not (np.diff(arr, axis=1) > 0).all():
        raise ValueError(
            "contour rows must be strictly increasing in dB per band — "
            "got a table that looks phon-major or scrambled")
    _EXACT_CONTOURS = arr


@lru_cache(maxsize=16)
def contour_table(sample_rate: float, fft_size: int) -> np.ndarray:
    """``[ERB_BANDS, len(PHONS)]`` dB values of each contour at each band
    centre (the transcription of ML.cpp's ``contours[42][11]``).

    A verbatim table installed via :func:`load_contour_table` (or the
    ``STRUGATZKI_CONTOURS`` env var: a text file ``np.loadtxt`` can read,
    42×11) takes precedence for the UGen's native 44.1 kHz / FFT-1024
    configuration.

    Two pragmatic adjustments, both confined to signal levels far below
    program material: every entry is floored at +0.1 dB so digital silence
    (banded power clamped at 0 dB) always falls below the first (2-phon)
    contour and yields exactly zero sones, and rows are forced strictly
    increasing so the dB → phon interpolation is well defined.
    """
    if (_EXACT_CONTOURS is not None
            and (sample_rate, fft_size) == (44100.0, 1024)):
        table = _EXACT_CONTOURS.copy()
    else:
        centers = band_centers_hz(sample_rate, fft_size)
        table = np.empty((ERB_BANDS, len(PHONS)), np.float64)
        for j, p in enumerate(PHONS):
            table[:, j] = iso226_spl(centers, p)
    table = np.maximum(table, 0.1)
    for j in range(1, len(PHONS)):
        table[:, j] = np.maximum(table[:, j], table[:, j - 1] + 0.01)
    return table


if os.environ.get("STRUGATZKI_CONTOURS"):
    try:
        load_contour_table(
            np.loadtxt(os.environ["STRUGATZKI_CONTOURS"], dtype=np.float64))
    except Exception as e:
        raise RuntimeError(
            f"STRUGATZKI_CONTOURS: cannot load contour table from "
            f"{os.environ['STRUGATZKI_CONTOURS']!r}: {e}") from e
