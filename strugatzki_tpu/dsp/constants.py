"""DSP front-end constants and calibration notes.

The reference delegates feature extraction to two C++ UGens inside
SuperCollider's scsynth (reference impl/FeatureExtractionImpl.scala:50-54,
README.md:79): ``MFCC.kr(chain, numCoeffs)`` by Dan Stowell and
``Loudness.kr(chain) / 32`` by Nick Collins.  Their source is not part of the
reference repository, so this module freezes a from-scratch, fully documented
specification with the same *structure* (42-band mel filterbank → log → DCT;
bark-band excitation → phon → sone) and the same *output conventions*
(MFCCs roughly in 0..1; loudness in sones with the Stevens 2^(phon/10) law the
reference's boost estimator assumes, notes/BoostFactor.txt:31-37; division by
32 mapping typical program material into 0..1).

Downstream compatibility argument: every analysis first normalizes each
feature channel by the database-wide p01/p99 range (``feat_norms.aif``,
MathUtil.scala:132-152) and Pearson-style correlation is invariant under
per-channel affine maps, so analyses are insensitive to per-channel scale and
offset choices here; what matters is the information content (band layout,
log law) and the loudness *ratio* law for the boost estimate, both of which
follow the published algorithms.  Exact-constant calibration against a live
scsynth can be done later by adjusting only this module.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# MFCC
# ---------------------------------------------------------------------------

#: Number of triangular mel bands (SC's MFCC uses a fixed 42-band filterbank).
MEL_BANDS = 42

#: Filterbank frequency range: lower edge in Hz; upper edge is the Nyquist
#: frequency of the analyzed signal.
MEL_FMIN = 20.0

#: Floor inside the log to avoid -inf on silent bands.
MEL_LOG_FLOOR = 1e-10

#: The DCT keeps coefficients 1..numCoeffs (the 0th/DC cepstral coefficient,
#: overall energy, is carried by the loudness channel instead).
DCT_FIRST_COEFF = 1

#: Affine output mapping: out = coeff * MFCC_SCALE + MFCC_OFFSET, chosen so
#: typical material lands in ~0..1 (the scale SC's UGen exposes to users).
MFCC_SCALE = 0.1
MFCC_OFFSET = 0.5


def mel_of_hz(f):
    """HTK/O'Shaughnessy mel scale: 1127·ln(1 + f/700)."""
    return 1127.01048 * np.log1p(np.asarray(f, dtype=np.float64) / 700.0)


def hz_of_mel(m):
    return 700.0 * (np.expm1(np.asarray(m, dtype=np.float64) / 1127.01048))


# ---------------------------------------------------------------------------
# Loudness
# ---------------------------------------------------------------------------

#: Number of Zwicker critical bands (bark 0..24).
BARK_BANDS = 24

#: Full-scale calibration: a 0 dBFS 1 kHz sine is assigned this SPL/phon
#: level.  90 phon → 2^((90−40)/10) = 32 sones, which is exactly the
#: reference's ``Loudness.kr(chain) / 32`` headroom (FeatureExtractionImpl
#: .scala:52): a full-scale sine maps to 1.0 on the loudness channel.
FULL_SCALE_PHON = 90.0

#: Stevens' law pivot: 40 phon = 1 sone, doubling per +10 phon.  This is the
#: exact law the boost estimator inverts (notes/BoostFactor.txt:31-37:
#: ``boost = exp((ln l1 − ln l2)/0.6)`` ⇔ sone ∝ 10^(0.03·phon)).
SONE_PIVOT_PHON = 40.0

#: Below the pivot, loudness falls off steeper (Zwicker's low-level
#: correction): sone = (phon/40)^2.642.
LOW_PHON_EXPONENT = 2.642

#: Spectral masking strength (upward spread of masking), dB per bark.  SC's
#: UGen exposes ``smask`` defaulting to 0.25; we model upward spreading with a
#: slope of ``SPREAD_DB_PER_BARK / smask``-style attenuation, i.e. a masker
#: contributes (level − slope·Δbark) to higher bands.
SPECTRAL_MASK_DEFAULT = 0.25
SPREAD_DB_PER_BARK = 27.0

#: Temporal masking: per-frame decay of the running band-level maximum in dB
#: per frame, scaled by the ``tmask`` parameter (SC default 1).  Implemented
#: as an associative running max so frames still process in parallel.
TEMPORAL_MASK_DEFAULT = 1.0
TEMPORAL_DECAY_DB_PER_FRAME = 15.0

#: Silence floor for band SPLs, dB.
BAND_DB_FLOOR = -120.0


def bark_of_hz(f):
    """Zwicker-Terhardt critical band rate: 13·atan(0.00076 f) + 3.5·atan((f/7500)²)."""
    f = np.asarray(f, dtype=np.float64)
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


def ear_weighting_db(f):
    """Outer/middle-ear transfer (Terhardt threshold-in-quiet shape),
    normalized to 0 dB at 1 kHz.

    W(f) = −(3.64 (f/kHz)^−0.8 − 6.5 e^(−0.6 (f/kHz − 3.3)²) + 1e−3 (f/kHz)⁴)
    re-referenced so W(1000) = 0.  Applied to band SPLs before the phon→sone
    mapping; this is what gives the loudness (and hence the boost estimate)
    its frequency dependence, analogous to the reference UGen's documented
    error-vs-frequency profile (notes/BoostFactor.txt:20-29).
    """
    f = np.maximum(np.asarray(f, dtype=np.float64), 1.0)
    khz = f / 1000.0
    thr = (3.64 * khz ** -0.8
           - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
           + 1e-3 * khz ** 4)
    thr_1k = (3.64 - 6.5 * np.exp(-0.6 * (1.0 - 3.3) ** 2) + 1e-3)
    return -(thr - thr_1k)
