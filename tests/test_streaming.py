"""Streaming extraction + incremental writer: must be bit-identical to the
whole-file path."""

import numpy as np

import strugatzki_tpu.analysis.extraction as ext
from strugatzki_tpu import ExtractionConfig, FeatureExtraction
from strugatzki_tpu.dsp.frontend import (extract_features,
                                         extract_features_streaming)
from strugatzki_tpu.io import audiofile as af
from strugatzki_tpu.io.formats import AIFF, WAVE
from strugatzki_tpu.io.audiofile import AudioFileSpec, SampleFormat


def test_incremental_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.uniform(-0.9, 0.9, size=(3, 7777)).astype(np.float32)
    for ftype, fmt in ((AIFF, SampleFormat.FLOAT), (AIFF, SampleFormat.INT16),
                       (WAVE, SampleFormat.FLOAT)):
        p = tmp_path / f"w_{ftype.id}_{fmt}.{ftype.extension}"
        with af.open_write(p, AudioFileSpec(ftype, fmt, 3, 22050.0)) as w:
            for start in range(0, 7777, 1000):
                w.write_frames(data[:, start:start + 1000])
        back, spec = af.read(p)
        assert spec.num_frames == 7777
        tol = 0 if fmt == SampleFormat.FLOAT else 1 / 32768
        np.testing.assert_allclose(back, data, atol=tol or 1e-7)


def test_streaming_matches_whole_file():
    rng = np.random.default_rng(1)
    sr = 44100.0
    audio = (0.3 * rng.standard_normal(int(sr * 30))).astype(np.float32)

    whole = extract_features(audio, sr)

    chunks = []
    pos = [0]

    def read_samples(n):
        out = audio[pos[0]:pos[0] + n]
        pos[0] += n
        return out

    total = extract_features_streaming(
        read_samples, len(audio), sr, lambda f: chunks.append(f),
        chunk_frames=1024)
    streamed = np.concatenate(chunks, axis=1)
    assert streamed.shape == whole.shape
    assert total == whole.shape[1]
    # loudness is plan-invariant (the only cross-frame state is the
    # one-frame temporal-mask carry): both rows hold the 2e-5 budget
    np.testing.assert_allclose(streamed[0], whole[0], atol=2e-5)
    np.testing.assert_allclose(streamed[1:], whole[1:], atol=2e-5)


def test_streaming_processor_end_to_end(tmp_path, monkeypatch):
    """Force the streaming path in the extraction processor and compare the
    written feature file against the in-memory path."""
    rng = np.random.default_rng(2)
    sr = 44100
    audio = (0.3 * rng.standard_normal(5 * sr)).astype(np.float32)
    p = tmp_path / "long.aif"
    af.write(p, audio[None], AudioFileSpec(AIFF, SampleFormat.FLOAT, 1,
                                           float(sr)))

    f1 = tmp_path / "whole_feat.aif"
    FeatureExtraction.run(ExtractionConfig(
        audio_input=str(p), feature_output=str(f1))).result(timeout=300)

    monkeypatch.setattr(ext, "STREAMING_THRESHOLD", 1000)
    f2 = tmp_path / "stream_feat.aif"
    FeatureExtraction.run(ExtractionConfig(
        audio_input=str(p), feature_output=str(f2))).result(timeout=300)

    a, sa = af.read(f1)
    b, sb = af.read(f2)
    assert sa.num_frames == sb.num_frames
    assert abs(sa.sample_rate - sb.sample_rate) < 1e-9
    np.testing.assert_allclose(a[0], b[0], atol=2e-5)
    np.testing.assert_allclose(a[1:], b[1:], atol=2e-5)


def test_streaming_pcm16_int16_path(tmp_path, monkeypatch):
    """PCM16 sources stream as raw int16 (half the upload), bit-identical
    to the float path."""
    rng = np.random.default_rng(3)
    sr = 44100
    audio = np.clip(0.3 * rng.standard_normal(3 * sr), -0.99, 0.99)
    audio = (np.round(audio * 32768.0).astype(np.int16)
             .astype(np.float32) / 32768.0)
    p = tmp_path / "pcm.aif"
    af.write(p, audio[None], AudioFileSpec(AIFF, SampleFormat.INT16, 1,
                                           float(sr)))

    f_mem = tmp_path / "mem_feat.aif"
    FeatureExtraction.run(ExtractionConfig(
        audio_input=str(p), feature_output=str(f_mem))).result(timeout=300)

    monkeypatch.setattr(ext, "STREAMING_THRESHOLD", 1000)
    f_str = tmp_path / "str_feat.aif"
    FeatureExtraction.run(ExtractionConfig(
        audio_input=str(p), feature_output=str(f_str))).result(timeout=300)

    a, _ = af.read(f_mem)
    b, _ = af.read(f_str)
    np.testing.assert_allclose(a[0], b[0], atol=2e-5)
    np.testing.assert_allclose(a[1:], b[1:], atol=2e-5)
