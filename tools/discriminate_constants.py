"""Discriminate the remaining C-grade ML.cpp constants from a
reference-extracted feature file.

Four details of the reference's DSP front-end cannot be pinned offline
(docs/ML_DERIVATION.md): what the MFCC triangles sum (power vs magnitude),
the MFCC log floor, the masking update forms, and the absolute dB
calibration.  Each is held behind a named hypothesis
(``dsp/constants.py::HYPOTHESES`` / ``set_hypothesis``).  This tool makes
the discrimination a one-command procedure for any machine that has the
reference toolchain:

    # 1. here: write the probe signal
    python tools/discriminate_constants.py --make-probe probe.aif
    # 2. on the reference machine: extract it
    strugatzki -f -d /tmp/out probe.aif        # -> probe_feat.aif
    # 3. here: decide every constant
    python tools/discriminate_constants.py probe.aif probe_feat.aif

The probe concatenates segments that make the hypotheses observable:

  A  1 kHz amplitude ladder (0/−6/−12/−24/−48 dBFS) — pins FULL_SCALE_DB
     (and re-checks the fitted contours: each step's Δloudness follows the
     local phon slope).
  B  a single tone vs a 9-tone cluster of equal total power inside one mel
     band — power-summation predicts equal band energy, magnitude predicts
     +log10(3); band contrast separates the hypotheses after the DCT.
  C  very quiet tones (−80/−100/−120 dBFS) and digital silence — the MFCC
     log floor only matters when band energy reaches it, so these frames
     rank the floor candidates.
  D  a loud 400 Hz masker alone, a weak 4 kHz probe alone, then both —
     the masking skirt under the masker differs qualitatively between the
     factor-in-dB form (e·0.25: a huge skirt at high levels) and the
     factor-in-intensity form (a constant −6 dB/band slope).
  E  a 0.3 s burst then 1.2 s of silence — the "feedback" temporal-masking
     candidate (running max at tmask = 1) never decays; the shipped
     one-frame-deep form does.

Scoring: features of the probe are extracted under every candidate and
compared to the reference file with a per-channel affine-invariant
residual (normalization + Pearson make per-channel affine maps
unobservable, so this is the operative distance).  The best candidate per
axis is reported with its margin.  The same scorer self-validates offline:
``tests/test_discriminators.py`` flips each hypothesis, uses our own
extraction as a stand-in reference, and asserts the tool recovers it.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 44100.0

#: numeric scan grids (structural axes come from constants.HYPOTHESES)
LOG_FLOOR_GRID = (1e-12, 1e-10, 1e-8, 1e-6, 1e-4)
FULL_SCALE_GRID = (84.0, 87.0, 90.0, 93.0, 96.0)


def _tone(freq, dur, amp, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _gap(dur=0.25, sr=SR):
    return np.zeros(int(dur * sr), np.float32)


def make_probe(sr=SR) -> np.ndarray:
    """The deterministic probe signal (see module docstring)."""
    segs = []
    # A: calibration ladder at 1 kHz
    for db in (0.0, -6.0, -12.0, -24.0, -48.0):
        segs += [_tone(1000, 0.8, 10 ** (db / 20)), _gap()]
    # B: tonal vs equal-power 9-tone cluster inside one mel band (~4 kHz;
    # mel bands are ~700 Hz wide there, the cluster spans ±120 Hz)
    segs += [_tone(4000, 1.0, 0.5), _gap()]
    cluster = np.zeros(int(1.0 * sr), np.float32)
    for k in range(9):
        cluster += _tone(3880 + 30 * k, 1.0, 0.5 / 3.0)
    segs += [cluster, _gap()]
    # C: quiet tones for the log floor, plus true silence
    for db in (-80.0, -100.0, -120.0):
        segs += [_tone(2500, 0.6, 10 ** (db / 20)), _gap()]
    segs += [_gap(0.6)]
    # D: masking — masker alone, probe alone, both
    masker = _tone(400, 0.8, 0.7)
    probe_hi = _tone(4000, 0.8, 0.02)
    segs += [masker, _gap(), probe_hi, _gap(),
             (masker + probe_hi).astype(np.float32), _gap()]
    # E: burst then silence for temporal masking
    segs += [_tone(800, 0.3, 0.8), _gap(1.2)]
    return np.concatenate(segs)


def _affine_residual(ours: np.ndarray, ref: np.ndarray) -> float:
    """Per-channel affine-invariant distance: rms residual of the best
    affine map ours→ref, normalized by the ref channel's spread, summed
    over channels.  (The operative parity metric — see module docstring.)"""
    n = min(ours.shape[1], ref.shape[1])
    x_all, y_all = ours[:, :n].astype(np.float64), ref[:, :n].astype(np.float64)
    total = 0.0
    for ch in range(ref.shape[0]):
        x, y = x_all[ch], y_all[ch]
        sy = y.std()
        if sy < 1e-12:
            total += float(np.sqrt(((x - x.mean()) ** 2).mean()))
            continue
        sx = x.std()
        if sx < 1e-12:
            total += 1.0  # constant prediction for a varying reference
            continue
        a = ((x - x.mean()) * (y - y.mean())).mean() / (sx * sx)
        b = y.mean() - a * x.mean()
        resid = y - (a * x + b)
        total += float(np.sqrt((resid ** 2).mean()) / sy)
    return total


def decide(audio: np.ndarray, ref_feats: np.ndarray, sr=SR, out=sys.stdout):
    """Score every hypothesis candidate against ``ref_feats`` and return
    ``{axis: (winner, scores)}``.  Leaves the shipped defaults restored."""
    from strugatzki_tpu.dsp import constants as C
    from strugatzki_tpu.dsp.frontend import extract_features

    defaults = {name: getattr(C, name) for name in C.HYPOTHESES}
    defaults["MEL_LOG_FLOOR"] = C.MEL_LOG_FLOOR
    defaults["FULL_SCALE_DB"] = C.FULL_SCALE_DB

    axes = {name: list(vals) for name, vals in C.HYPOTHESES.items()}
    axes["MEL_LOG_FLOOR"] = list(LOG_FLOOR_GRID)
    axes["FULL_SCALE_DB"] = list(FULL_SCALE_GRID)

    decisions = {}
    try:
        for axis, candidates in axes.items():
            scores = {}
            for cand in candidates:
                C.set_hypothesis(**{**defaults, axis: cand})
                ours = np.asarray(extract_features(audio, sr))
                scores[cand] = _affine_residual(ours, ref_feats)
            winner = min(scores, key=scores.get)
            ranked = sorted(scores.values())
            margin = (ranked[1] - ranked[0]) / max(ranked[0], 1e-12)
            decisions[axis] = (winner, scores)
            print(f"{axis}: {winner!r}  (margin {margin * 100:.1f}% over "
                  f"runner-up; scores "
                  f"{ {k: round(v, 4) for k, v in scores.items()} })",
                  file=out)
    finally:
        C.set_hypothesis(**defaults)
    return decisions


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("audio", nargs="?", help="the probe audio file")
    ap.add_argument("ref_feat", nargs="?",
                    help="the reference-extracted *_feat.aif of that probe")
    ap.add_argument("--make-probe", metavar="OUT.aif",
                    help="write the probe signal and exit")
    args = ap.parse_args()

    from strugatzki_tpu.io import audiofile as af
    from strugatzki_tpu.io.formats import AIFF

    if args.make_probe:
        sig = make_probe()
        af.write(args.make_probe, sig[None],
                 af.AudioFileSpec(AIFF, af.SampleFormat.FLOAT, 1, SR))
        print(f"probe written: {args.make_probe} "
              f"({len(sig) / SR:.1f}s mono fl32 AIFF)")
        return
    if not (args.audio and args.ref_feat):
        ap.error("need AUDIO REF_FEAT (or --make-probe)")
    audio, spec = af.read(args.audio)
    ref, _ = af.read(args.ref_feat)
    decide(audio.sum(axis=0), np.asarray(ref), sr=spec.sample_rate)


if __name__ == "__main__":
    main()
