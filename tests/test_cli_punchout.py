"""CLI punch-out mode and misc processor behaviors."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from strugatzki_tpu.io import audiofile as af
from strugatzki_tpu.io.formats import AIFF
from strugatzki_tpu.io.audiofile import AudioFileSpec, SampleFormat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    env = dict(os.environ)
    env["STRUGATZKI_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "strugatzki_tpu", *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)


def test_cli_punch_out(tmp_path):
    sr = 44100
    rng = np.random.default_rng(3)
    snd = tmp_path / "snd"
    db = tmp_path / "db"
    snd.mkdir()
    db.mkdir()
    t = np.arange(3 * sr) / sr
    src = (0.4 * np.sin(2 * np.pi * 300 * t)
           + 0.1 * rng.standard_normal(3 * sr)).astype(np.float32)
    # target embeds src's 0.5-1.0s at 0.5s and src's 1.5-2.0s at 2.0s
    tgt = (0.2 * rng.standard_normal(3 * sr)).astype(np.float32)
    tgt[int(0.5 * sr):int(1.0 * sr)] = src[int(0.5 * sr):int(1.0 * sr)]
    tgt[int(2.0 * sr):int(2.5 * sr)] = src[int(1.5 * sr):int(2.0 * sr)]
    for name, x in (("src", src), ("tgt", tgt)):
        af.write(snd / f"{name}.aif", x[None],
                 AudioFileSpec(AIFF, SampleFormat.INT16, 1, float(sr)))
    assert run_cli("-f", "-d", str(db), str(snd)).returncode == 0
    assert run_cli("--stats", "-d", str(db)).returncode == 0

    r = run_cli("-c", "-d", str(db),
                "--in-start", "0.5", "--in-stop", "1.0", "--in-temp", "0.1",
                "--out-start", "1.5", "--out-stop", "2.0", "--out-temp", "0.1",
                "--dur-min", "1.0", "--dur-max", "2.5",
                "-m", "2", str(db / "src_feat.xml"))
    assert r.returncode == 0, r.stderr
    assert "Success." in r.stdout
    # punch-out mode prints span stop and boost out
    assert "Span stop" in r.stdout and "Boost out" in r.stdout
    assert "tgt.aif" in r.stdout


def test_cli_punch_out_requires_both_bounds(tmp_path):
    # only --out-start given -> usage error (Strugatzki.scala:145-153)
    db = tmp_path
    meta = tmp_path / "x_feat.xml"
    from strugatzki_tpu import ExtractionConfig
    # create a dummy audio so read_spec works
    af.write(tmp_path / "x.aif", np.zeros((1, 100), np.float32),
             AudioFileSpec(AIFF, SampleFormat.INT16, 1, 44100.0))
    ExtractionConfig(audio_input=str(tmp_path / "x.aif"),
                     feature_output=str(tmp_path / "x_feat.aif")).save_xml(meta)
    r = run_cli("-c", "-d", str(db), "--in-start", "0", "--in-stop", "1",
                "--out-start", "1.5", "--dur-min", "0.5", "--dur-max", "1",
                str(meta))
    assert r.returncode == 1


def test_processor_hooks():
    from strugatzki_tpu.runtime.processor import Processor

    events = []

    def ok_body(proc):
        return 42

    p = Processor(ok_body, name="ok")
    p.on_complete(lambda r: events.append(("complete", r.is_success)))
    p.on_failure(lambda r: events.append(("failure", r.is_success)))
    p.start()
    assert p.result(10) == 42
    assert events == [("complete", True)]

    events.clear()

    def bad_body(proc):
        raise RuntimeError("boom")

    p2 = Processor(bad_body, name="bad")
    p2.on_complete(lambda r: events.append("complete"))
    p2.on_failure(lambda r: events.append("failure"))
    p2.start()
    with pytest.raises(RuntimeError):
        p2.result(10)
    assert set(events) == {"complete", "failure"}


def test_selfsim_auto_decimation_warning(tmp_path, capsys):
    """numCorrs/decim above 0xB504 raises decimation with the reference's
    warning (SelfSimilarityImpl.scala:81-91) — exercised via the processor
    with a tiny fake ceiling is impractical, so use corr math directly."""
    import strugatzki_tpu.analysis.self_similarity as ss
    # monkeypatch the ceiling to a small value to exercise the auto-adjust
    old = ss._MAX_EXTENT
    ss._MAX_EXTENT = 50
    try:
        from strugatzki_tpu import ExtractionConfig, SelfSimilarityConfig
        rng = np.random.default_rng(0)
        feats = np.abs(0.5 + 0.1 * rng.standard_normal((14, 400))).astype(np.float32)
        fp = tmp_path / "a_feat.aif"
        af.write(fp, feats, af.feature_spec(14, 44100 / 512))
        mp = tmp_path / "a_feat.xml"
        ExtractionConfig(audio_input=str(tmp_path / "a.aif"),
                         feature_output=str(fp)).save_xml(mp)
        out = tmp_path / "a.png"
        cfg = SelfSimilarityConfig(meta_input=str(mp), image_output=str(out),
                                   corr_len=20 * 512, normalize=False,
                                   decimation=1)
        from strugatzki_tpu.analysis.self_similarity import SelfSimilarity
        SelfSimilarity.run(cfg).result(timeout=300)
        assert out.exists()
        import struct
        w, h = struct.unpack(">II", out.read_bytes()[16:24])
        assert w <= 50
    finally:
        ss._MAX_EXTENT = old


def test_correlation_abort(tmp_path):
    """Abort lands between chunks/files of a running search."""
    from strugatzki_tpu import (CorrelationConfig, ExtractionConfig,
                                FeatureCorrelation, Punch, Span)

    rng = np.random.default_rng(4)
    db = tmp_path
    for i in range(6):
        feats = np.abs(0.5 + 0.1 * rng.standard_normal((14, 2000))).astype(np.float32)
        af.write(db / f"f{i}_feat.aif", feats, af.feature_spec(14, 44100 / 512))
        ExtractionConfig(audio_input=str(db / f"f{i}.aif"),
                         feature_output=str(db / f"f{i}_feat.aif")
                         ).save_xml(db / f"f{i}_feat.xml")
    cfg = CorrelationConfig(
        database_folder=str(db), meta_input=str(db / "f0_feat.xml"),
        punch_in=Punch(Span(0, 44100), 0.5), normalize=False, num_matches=3)
    proc = FeatureCorrelation.run(cfg)
    proc.abort()
    res = proc.ready(timeout=300)
    assert res.is_aborted or res.is_success


def test_logging_trace_and_profile(tmp_path, monkeypatch):
    from strugatzki_tpu.runtime.logging import logger, profile, trace
    import logging
    records = []

    class H(logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    h = H()
    logger.addHandler(h)
    old = logger.level
    logger.setLevel(logging.DEBUG)
    try:
        with trace("unit-span", file="x.aif"):
            pass
        assert any("unit-span took" in m for m in records)
        # profile is a no-op without STRUGATZKI_PROFILE
        monkeypatch.delenv("STRUGATZKI_PROFILE", raising=False)
        with profile("nothing"):
            pass
    finally:
        logger.removeHandler(h)
        logger.setLevel(old)


def test_cli_extracts_wav_inputs(tmp_path):
    """Directory expansion identifies WAV (and skips non-audio) like the
    reference's AudioFile.identify scan (Strugatzki.scala:479-487)."""
    from strugatzki_tpu.io.formats import WAVE
    snd = tmp_path / "snd"
    db = tmp_path / "db"
    snd.mkdir()
    db.mkdir()
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(44100)).astype(np.float32)
    af.write(snd / "w.wav", np.stack([x, -x]),
             AudioFileSpec(WAVE, SampleFormat.INT16, 2, 44100.0))
    (snd / "readme.txt").write_text("not audio")
    r = run_cli("-f", "-d", str(db), str(snd))
    assert r.returncode == 0, r.stderr
    names = sorted(os.listdir(db))
    assert names == ["w_feat.aif", "w_feat.xml"]
    data, spec = af.read(db / "w_feat.aif")
    assert spec.num_channels == 14
    # stereo mix of x and -x cancels -> near-silent loudness
    assert data[0].max() < 1e-3


def test_launcher_script_from_other_cwd(tmp_path):
    import subprocess
    env = dict(os.environ)
    env["STRUGATZKI_PLATFORM"] = "cpu"
    r = subprocess.run([os.path.join(REPO, "strugatzki"), "--bogus"],
                       capture_output=True, text=True, cwd=str(tmp_path),
                       env=env, timeout=120)
    assert r.returncode == 1
    assert "Usage" in r.stderr


def test_selfsim_abort(tmp_path):
    from strugatzki_tpu import ExtractionConfig, SelfSimilarityConfig
    from strugatzki_tpu.analysis.self_similarity import SelfSimilarity
    rng = np.random.default_rng(6)
    feats = np.abs(0.5 + 0.1 * rng.standard_normal((14, 3000))).astype(np.float32)
    fp = tmp_path / "a_feat.aif"
    af.write(fp, feats, af.feature_spec(14, 44100 / 512))
    mp = tmp_path / "a_feat.xml"
    ExtractionConfig(audio_input=str(tmp_path / "a.aif"),
                     feature_output=str(fp)).save_xml(mp)
    cfg = SelfSimilarityConfig(meta_input=str(mp), normalize=False,
                               image_output=str(tmp_path / "x.png"),
                               corr_len=30 * 512)
    proc = SelfSimilarity.run(cfg)
    proc.abort()
    res = proc.ready(timeout=300)
    assert res.is_aborted or res.is_success


def test_result_event_dispatched_before_waiters_wake():
    """Regression for a completion race: the Result event must reach the
    observer BEFORE ready()/result() waiters wake, or callers like the CLI
    read their observer state too early (intermittent None results)."""
    from strugatzki_tpu.runtime.processor import Processor, Result

    for _ in range(50):
        seen = []

        def body(proc):
            return "v"

        p = Processor(body, name="race",
                      observer=lambda e: seen.append(e)
                      if isinstance(e, Result) else None)
        p.start()
        p.ready(10)
        assert seen and seen[0].value == "v"
