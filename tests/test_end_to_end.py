"""End-to-end: audio file → extraction (feature AIFF + XML sidecar) →
segmentation through the public processor factories."""

import os

import numpy as np

from strugatzki_tpu import (ExtractionConfig, FeatureExtraction,
                            FeatureSegmentation, Progress, Result,
                            SegmentationConfig)
from strugatzki_tpu.io import audiofile as af
from strugatzki_tpu.io.formats import AIFF
from strugatzki_tpu.io.audiofile import AudioFileSpec, SampleFormat


def make_test_audio(path, dur=6.0, sr=44100):
    """Three clearly distinct sections: tone, noise, chord."""
    rng = np.random.default_rng(42)
    n = int(dur * sr / 3)
    t = np.arange(n) / sr
    s1 = 0.5 * np.sin(2 * np.pi * 440 * t)
    s2 = 0.3 * rng.standard_normal(n)
    s3 = 0.25 * (np.sin(2 * np.pi * 220 * t) + np.sin(2 * np.pi * 330 * t)
                 + np.sin(2 * np.pi * 2500 * t))
    x = np.concatenate([s1, s2, s3]).astype(np.float32)
    af.write(path, x[None, :],
             AudioFileSpec(AIFF, SampleFormat.INT16, 1, float(sr)))
    return len(x)


def test_extract_then_segment(tmp_path):
    audio_path = tmp_path / "piece.aif"
    n_samples = make_test_audio(audio_path)

    feat_path = tmp_path / "piece_feat.aif"
    meta_path = tmp_path / "piece_feat.xml"

    cfg = ExtractionConfig(
        audio_input=str(audio_path), feature_output=str(feat_path),
        meta_output=str(meta_path))

    events = []
    proc = FeatureExtraction.run(cfg, observer=events.append)
    proc.result(timeout=300)

    # observer got progress then a successful result
    assert any(isinstance(e, Progress) for e in events)
    assert isinstance(events[-1], Result) and events[-1].is_success

    # feature file: AIFC fl32, 14 channels, ceil(n/512) − 1 frames, featRate
    data, spec = af.read(feat_path)
    expected_frames = (n_samples + 511) // 512 - 1
    assert spec.num_channels == 14
    assert spec.num_frames == expected_frames
    assert abs(spec.sample_rate - 44100 / 512) < 1e-6
    assert np.isfinite(data).all()

    # sidecar parses back to the same settings
    cfg2 = ExtractionConfig.from_xml_file(meta_path)
    assert cfg2.num_coeffs == 13 and cfg2.fft_size == 1024

    # segmentation without normalization (the minimum end-to-end slice,
    # SURVEY §7 step 4)
    seg = SegmentationConfig(
        meta_input=str(meta_path), normalize=False, corr_len=44100,
        num_breaks=2, min_spacing=44100)
    breaks = FeatureSegmentation.run(seg).result(timeout=300)
    assert len(breaks) == 2
    # section cuts at 2s and 4s
    secs = sorted(b.pos / 44100.0 for b in breaks)
    assert abs(secs[0] - 2.0) < 0.4
    assert abs(secs[1] - 4.0) < 0.4


def test_extraction_abort(tmp_path):
    audio_path = tmp_path / "long.aif"
    x = np.zeros(44100 * 4, np.float32)
    af.write(audio_path, x[None, :],
             AudioFileSpec(AIFF, SampleFormat.INT16, 1, 44100.0))
    cfg = ExtractionConfig(audio_input=str(audio_path),
                           feature_output=str(tmp_path / "f.aif"))
    proc = FeatureExtraction.run(cfg)
    proc.abort()
    res = proc.ready(timeout=300)
    # either aborted mid-flight or finished just before the abort landed
    assert res.is_aborted or res.is_success


def test_extraction_channels_behaviors(tmp_path):
    sr = 44100
    t = np.arange(sr) / sr
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.3 * np.random.default_rng(0).standard_normal(sr)
    stereo = np.stack([left, right]).astype(np.float32)
    p = tmp_path / "st.aif"
    af.write(p, stereo, AudioFileSpec(AIFF, SampleFormat.FLOAT, 2, float(sr)))

    outs = {}
    for mode, name in ((0, "mix"), (1, "first"), (2, "last")):
        fp = tmp_path / f"st_{name}.aif"
        cfg = ExtractionConfig(audio_input=str(p), feature_output=str(fp),
                               channels_behavior=mode)
        from strugatzki_tpu import FeatureExtraction
        FeatureExtraction.run(cfg).result(timeout=300)
        outs[name], _ = af.read(fp)

    # three behaviors give three different loudness tracks
    assert not np.allclose(outs["mix"], outs["first"])
    assert not np.allclose(outs["first"], outs["last"])
