"""Batch extraction (one dispatch for many files) + concurrency stress."""

import numpy as np

from strugatzki_tpu.dsp.frontend import (extract_features,
                                         extract_features_batch)


def test_batch_matches_per_file():
    rng = np.random.default_rng(0)
    sr = 44100.0
    audios = [(0.2 * rng.standard_normal(int(sr * d))).astype(np.float32)
              for d in (2.0, 2.0, 2.0)]
    batch = extract_features_batch(audios, sr)
    for i, a in enumerate(audios):
        single = extract_features(a, sr)
        f = single.shape[1]
        np.testing.assert_allclose(batch[i, 0, :f], single[0], atol=2e-5)
        np.testing.assert_allclose(batch[i, 1:, :f], single[1:], atol=2e-5)


def test_batch_mixed_lengths():
    rng = np.random.default_rng(1)
    sr = 44100.0
    audios = [(0.2 * rng.standard_normal(n)).astype(np.float32)
              for n in (44100, 66150, 22050)]
    batch = extract_features_batch(audios, sr)
    assert batch.shape[0] == 3 and batch.shape[1] == 14
    # each file's valid prefix matches the single-file result
    for i, a in enumerate(audios):
        single = extract_features(a, sr)
        f = single.shape[1]
        np.testing.assert_allclose(batch[i, 1:, :f], single[1:], atol=2e-5)


def test_concurrent_processors_isolated(tmp_path):
    """Several processors running simultaneously on their own threads must
    not interfere (the reference's one-thread-per-process model)."""
    from strugatzki_tpu import ExtractionConfig, FeatureExtraction
    from strugatzki_tpu.io import audiofile as af
    from strugatzki_tpu.io.formats import AIFF
    from strugatzki_tpu.io.audiofile import AudioFileSpec, SampleFormat

    rng = np.random.default_rng(2)
    procs = []
    refs = []
    for i in range(4):
        x = (0.3 * rng.standard_normal(44100)).astype(np.float32)
        p = tmp_path / f"in{i}.aif"
        af.write(p, x[None], AudioFileSpec(AIFF, SampleFormat.FLOAT, 1, 44100.0))
        refs.append(extract_features(x, 44100.0))
        cfg = ExtractionConfig(audio_input=str(p),
                               feature_output=str(tmp_path / f"out{i}.aif"))
        procs.append(FeatureExtraction.run(cfg))
    for i, proc in enumerate(procs):
        proc.result(timeout=300)
        got, _ = af.read(tmp_path / f"out{i}.aif")
        np.testing.assert_allclose(got, refs[i], atol=1e-6)


def test_batch_as_device_zero_frames():
    """Files shorter than one step produce 0 feature frames; the as_device
    handle must still be block-shaped so finalize_features works (the
    grouped -f CLI path hits this for sub-12ms files)."""
    from strugatzki_tpu.dsp.frontend import (extract_features_batch,
                                             finalize_features)
    tiny = [np.zeros(100, np.float32), np.zeros(400, np.float32)]
    feats_dev, totals = extract_features_batch(tiny, 44100.0, as_device=True)
    assert totals == [0, 0]
    for i in range(2):
        out = finalize_features(feats_dev[i], totals[i])
        assert out.shape == (14, 0)


def test_batch_cli_failure_aborts_chain(tmp_path, capsys):
    """A failing file flushes the pending group first (its files report
    success), then reports the failure once and aborts the chain like the
    reference (Strugatzki.scala:506-508) — no duplicate Starting lines, no
    reports for never-started files."""
    from strugatzki_tpu.analysis.extraction import extract_batch_cli
    from strugatzki_tpu.io import audiofile as af
    from strugatzki_tpu.io.formats import AIFF
    from strugatzki_tpu.io.audiofile import AudioFileSpec, SampleFormat

    snd = tmp_path / "snd"
    db = tmp_path / "db"
    snd.mkdir()
    db.mkdir()
    rng = np.random.default_rng(1)
    for name in ("a", "c"):
        x = (0.2 * rng.standard_normal(22050)).astype(np.float32)
        af.write(snd / f"{name}.aif", x[None],
                 AudioFileSpec(AIFF, SampleFormat.INT16, 1, 44100.0))
    (snd / "b.aif").write_bytes(b"not an audio file at all")

    rc = extract_batch_cli([str(snd / "a.aif"), str(snd / "b.aif"),
                            str(snd / "c.aif")], str(db), 0)
    assert rc == 1
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert lines == [
        "Starting extraction... a.aif",
        "#" * 25 + "  Success.",
        "success = true - tail? true",
        "Starting extraction... b.aif",
        "  Failed: ",
        "success = false - tail? true",
    ], lines
    # c was never started; a's outputs exist, b/c's do not
    assert (db / "a_feat.aif").exists()
    assert not (db / "b_feat.aif").exists()
    assert not (db / "c_feat.aif").exists()


def test_group_staged_bytes_budget(tmp_path, monkeypatch, capsys):
    """The grouping budget must count the PROJECTED padded batch (pow2 B ×
    longest row × staged itemsize), and a disproportionately long file must
    flush the pending short group BEFORE being appended — the old raw-byte
    sum let one near-threshold file pad 60 short rows to its length."""
    import strugatzki_tpu.analysis.extraction as EX

    # pure-function checks
    mk = lambda n, dt=np.float32: (0, "f", None, np.zeros(n, dt), 44100.0)
    g = [mk(1000)] * 3
    assert EX._group_staged_bytes(g) == 4 * 1000 * 4          # pow2(3)=4
    assert EX._group_staged_bytes([mk(1000, np.int16)]) == 1000 * 2
    # one long row dominates the whole padded batch
    assert EX._group_staged_bytes(g + [mk(10_000_000)]) \
        == 4 * 10_000_000 * 4

    # end-to-end: shrink the budget so the third (longer) file must flush
    # the two short ones first — observable as two dispatch groups via the
    # transcript order (file 1 announced, then 1+2 succeed, then file 3)
    from strugatzki_tpu.io import audiofile as af
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([4000, 4000, 60000]):
        p = tmp_path / f"s{i}.aif"
        af.write(p, (0.2 * rng.standard_normal((1, n))).astype(np.float32),
                 af.AudioFileSpec(sample_format=af.SampleFormat.FLOAT,
                                  num_channels=1, sample_rate=44100.0))
        paths.append(str(p))
    monkeypatch.setattr(EX, "_GROUP_MAX_BYTES", 100_000)
    out = tmp_path / "db"
    out.mkdir()
    assert EX.extract_batch_cli(paths, str(out), 0) == 0
    transcript = capsys.readouterr().out
    # all three extracted
    for i in range(3):
        assert (out / f"s{i}_feat.aif").exists()
    # the long file was NOT in the short files' group: its Starting line
    # comes after both short files' Success lines
    s2 = transcript.index("s2.aif")
    assert transcript[:s2].count("Success.") == 2
