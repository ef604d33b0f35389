"""CLI end-to-end tests (subprocess, CPU backend): the full reference
command surface — extract, stats, correlate, segment, self-similarity,
cross-similarity — over a tiny synthetic database."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from strugatzki_tpu.io import audiofile as af
from strugatzki_tpu.io.formats import AIFF
from strugatzki_tpu.io.audiofile import AudioFileSpec, SampleFormat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, cwd=None):
    env = dict(os.environ)
    env["STRUGATZKI_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "strugatzki_tpu", *args],
        capture_output=True, text=True, env=env, cwd=cwd or REPO, timeout=600)


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    root = tmp_path_factory.mktemp("clidb")
    snd = root / "snd"
    db = root / "db"
    snd.mkdir()
    db.mkdir()
    sr = 44100
    rng = np.random.default_rng(0)
    t = np.arange(2 * sr) / sr
    tones = (0.4 * np.sin(2 * np.pi * 330 * t)
             + 0.2 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    noise = (0.25 * rng.standard_normal(2 * sr)).astype(np.float32)
    mixed = (0.25 * rng.standard_normal(2 * sr)).astype(np.float32)
    # plant tones[0.5s..1s) at a frame-aligned offset in mixed
    src = int(0.5 * sr)
    dst = src + 512 * 43  # multiple of the step
    mixed[dst:dst + src] = tones[src:2 * src]
    for name, x in (("tones", tones), ("noise", noise), ("mixed", mixed)):
        af.write(snd / f"{name}.aif", x[None],
                 AudioFileSpec(AIFF, SampleFormat.INT16, 1, float(sr)))
    r = run_cli("-f", "-d", str(db), str(snd))
    assert r.returncode == 0, r.stderr
    r = run_cli("--stats", "-d", str(db))
    assert r.returncode == 0, r.stderr
    return root, snd, db, dst


def test_extraction_outputs(demo):
    _, _, db, _ = demo
    names = sorted(os.listdir(db))
    assert names == ["feat_norms.aif", "mixed_feat.aif", "mixed_feat.xml",
                     "noise_feat.aif", "noise_feat.xml", "tones_feat.aif",
                     "tones_feat.xml"]
    data, spec = af.read(db / "tones_feat.aif")
    assert spec.num_channels == 14
    assert spec.num_frames == (2 * 44100 + 511) // 512 - 1


def test_correlate_finds_planted(demo):
    _, snd, db, dst = demo
    r = run_cli("-c", "-d", str(db), "--in-start", "0.5", "--in-stop", "1.0",
                "--in-temp", "0.0", "--dur-min", "0.25", "--dur-max", "1.0",
                "-m", "2", str(db / "tones_feat.xml"))
    assert r.returncode == 0, r.stderr
    assert "Success." in r.stdout
    assert "mixed.aif" in r.stdout
    # best match span start: template starts at feature frame
    # fullToFeat(0.5s); the copy is 43 frames later; positions are
    # feature-frame quantized (featToFull)
    expected = ((int(0.5 * 44100) + 256) // 512 + 43) * 512
    start_line = [l for l in r.stdout.splitlines() if "Span start" in l][0]
    assert int(start_line.split(":")[1]) == expected


def test_segmentation_runs(demo):
    _, _, db, _ = demo
    r = run_cli("-s", "-d", str(db), "--length", "0.3", "-m", "2",
                "--spacing", "0.4", str(db / "mixed_feat.xml"))
    assert r.returncode == 0, r.stderr
    assert "Similarity:" in r.stdout and "Position:" in r.stdout


def test_segmentation_requires_dir_for_norm(demo):
    _, _, db, _ = demo
    r = run_cli("-s", str(db / "mixed_feat.xml"))
    assert r.returncode == 1


def test_selfsimilarity_png(demo, tmp_path):
    _, _, db, _ = demo
    out = tmp_path / "ss.png"
    r = run_cli("-x", "-d", str(db), "--length", "0.4", "-m", "2",
                str(db / "mixed_feat.xml"), str(out))
    assert r.returncode == 0, r.stderr
    raw = out.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert w == h > 10


def test_crosssimilarity_wav_output(demo, tmp_path):
    _, _, db, _ = demo
    out = tmp_path / "sim.wav"
    r = run_cli("-y", "-d", str(db), "--span1-start", "0.5",
                "--span1-stop", "1.0", str(db / "tones_feat.xml"),
                str(db / "mixed_feat.xml"), str(out))
    assert r.returncode == 0, r.stderr
    sims, spec = af.read(out)
    assert spec.file_type.id == "wav"   # container switched by extension
    assert spec.num_channels == 1
    assert sims.shape[1] > 100


def test_cross_requires_norm_dir():
    r = run_cli("-y", "a.xml", "b.xml", "out.aif")
    assert r.returncode == 1
    assert "no-norm" in r.stderr


def test_usage_on_unknown_switch():
    r = run_cli("--bogus")
    assert r.returncode == 1
    assert "Usage" in r.stderr


def test_cli_channels_flag(demo, tmp_path):
    """-c first|last|mix selects the analysis channel (Strugatzki.scala:460-472)."""
    _, snd, _, _ = demo
    d1, d2 = tmp_path / "dbf", tmp_path / "dbl"
    d1.mkdir()
    d2.mkdir()
    assert run_cli("-f", "-d", str(d1), "-c", "first",
                   str(snd / "tones.aif")).returncode == 0
    assert run_cli("-f", "-d", str(d2), "-c", "last",
                   str(snd / "tones.aif")).returncode == 0
    a, _ = af.read(d1 / "tones_feat.aif")
    b, _ = af.read(d2 / "tones_feat.aif")
    # mono source: first == last
    np.testing.assert_array_equal(a, b)
    r = run_cli("-f", "-d", str(d1), "-c", "bogus", str(snd / "tones.aif"))
    assert r.returncode == 1


def test_batch_transcript_sequential_order(tmp_path):
    """Grouped `-f` mode must interleave the transcript per file exactly
    like the reference's sequential chain (Strugatzki.scala:495-511,
    :610-631): Starting / bar+Success / `success = … - tail? …` triplets,
    in input order, with tail? false only on the last file."""
    snd = tmp_path / "snd"
    db = tmp_path / "db"
    snd.mkdir()
    db.mkdir()
    sr = 44100
    rng = np.random.default_rng(7)
    for name in ("a", "b", "c"):
        x = (0.2 * rng.standard_normal(sr // 2)).astype(np.float32)
        af.write(snd / f"{name}.aif", x[None],
                 AudioFileSpec(AIFF, SampleFormat.INT16, 1, float(sr)))
    r = run_cli("-f", "-d", str(db),
                str(snd / "a.aif"), str(snd / "b.aif"), str(snd / "c.aif"))
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    expect = []
    # scopt's `inputs +:= f` prepends: bare arguments process in REVERSE
    # command-line order (Strugatzki.scala:458)
    for i, name in enumerate(("c", "b", "a")):
        expect.append(f"Starting extraction... {name}.aif")
        expect.append("#" * 25 + "  Success.")
        expect.append(f"success = true - tail? {'true' if i < 2 else 'false'}")
    assert lines == expect, lines


# ---------------------------------------------------------------------------
# round 3: the reference's real production invocations (notes/Ex.txt),
# transcribed shape-for-shape (times scaled to the 2 s fixture files) and
# asserting the transcript's exact line format (Strugatzki.scala:180-196)
# ---------------------------------------------------------------------------

def _match_blocks(stdout: str, punch_out: bool):
    """Parse the reference-format match transcript into blocks, asserting
    the exact line order File / Similarity / Span start / Boost in
    (+ Span stop / Boost out with a punch-out)."""
    lines = stdout.splitlines()
    assert any("Success." in l for l in lines), stdout
    blocks = []
    i = 0
    while i < len(lines):
        if lines[i].startswith("File      "):
            blk = {"file": lines[i][len("File      "):]}
            assert lines[i + 1].startswith("Similarity: "), lines[i + 1]
            # Java DecimalFormat renders NaN bare (no % / dB suffix) — NaN
            # sims are reachable and deliberately rank best (PARITY.md)
            assert lines[i + 1].rstrip().endswith(("%", "NaN"))
            assert lines[i + 2].startswith("Span start: ")
            assert lines[i + 3].startswith("Boost in  : ")
            assert lines[i + 3].rstrip().endswith((" dB", "NaN"))
            blk["sim"] = lines[i + 1].split(": ")[1]
            blk["start"] = int(lines[i + 2].split(": ")[1])
            i += 4
            if punch_out:
                assert lines[i].startswith("Span stop : "), lines[i]
                assert lines[i + 1].startswith("Boost out : ")
                blk["stop"] = int(lines[i].split(": ")[1])
                i += 2
            blocks.append(blk)
        else:
            i += 1
    return blocks


def test_ex1_dur_range_temp(demo):
    # run -c --in-start 0.800 --in-stop 1.146 --in-temp 0.4
    #        --dur-min 0.700 --dur-max 1.400 <meta>
    _, _, db, _ = demo
    r = run_cli("-c", "-d", str(db), "--in-start", "0.800", "--in-stop",
                "1.146", "--in-temp", "0.4", "--dur-min", "0.350",
                "--dur-max", "0.700", str(db / "tones_feat.xml"))
    assert r.returncode == 0, r.stderr
    blocks = _match_blocks(r.stdout, punch_out=False)
    assert len(blocks) == 1          # default numMatches = 1
    assert blocks[0]["start"] % 512 == 0   # featToFull quantization


def test_ex2_fixed_duration(demo):
    # run -c ... --dur-min 1.0 --dur-max 1.0 <meta>: a single punch length
    _, _, db, _ = demo
    r = run_cli("-c", "-d", str(db), "--in-start", "0.615", "--in-stop",
                "0.714", "--in-temp", "0.6", "--dur-min", "1.0",
                "--dur-max", "1.0", str(db / "tones_feat.xml"))
    assert r.returncode == 0, r.stderr
    blocks = _match_blocks(r.stdout, punch_out=False)
    assert len(blocks) == 1


def test_ex3_num_matches_per_file(demo):
    # run -c ... -m 10 --num-per-file 2 <meta>
    _, _, db, _ = demo
    r = run_cli("-c", "-d", str(db), "--in-start", "0.615", "--in-stop",
                "0.714", "--in-temp", "0.6", "--dur-min", "0.4",
                "--dur-max", "0.4", "-m", "10", "--num-per-file", "2",
                str(db / "tones_feat.xml"))
    assert r.returncode == 0, r.stderr
    blocks = _match_blocks(r.stdout, punch_out=False)
    assert 1 <= len(blocks) <= 10
    per_file = {}
    for b in blocks:
        per_file[b["file"]] = per_file.get(b["file"], 0) + 1
    assert max(per_file.values()) <= 2, per_file


def test_ex4_punch_out_wide(demo):
    # run -c ... -m 20 --num-per-file 20 --out-start --out-stop <meta>
    _, _, db, _ = demo
    r = run_cli("-c", "-d", str(db), "--in-start", "0.615", "--in-stop",
                "0.714", "--in-temp", "0.6", "--dur-min", "0.4",
                "--dur-max", "0.4", "-m", "20", "--num-per-file", "20",
                "--out-start", "0.712", "--out-stop", "0.770",
                str(db / "tones_feat.xml"))
    assert r.returncode == 0, r.stderr
    blocks = _match_blocks(r.stdout, punch_out=True)
    assert 1 <= len(blocks) <= 20
    # fixed punch length: every span is exactly fullToFeat(0.4 s) frames
    want = ((int(0.4 * 44100) + 256) // 512) * 512
    for b in blocks:
        assert b["stop"] - b["start"] == want, b


def test_ex5_punch_out_longer_durations(demo):
    # run -c ... --dur-min 2.0 --dur-max 3.0 -m 10 --num-per-file 4
    #     --out-start --out-stop <meta>   (durations scaled to 2 s files)
    _, _, db, _ = demo
    r = run_cli("-c", "-d", str(db), "--in-start", "0.615", "--in-stop",
                "0.714", "--in-temp", "0.6", "--dur-min", "0.5",
                "--dur-max", "0.75", "-m", "10", "--num-per-file", "4",
                "--out-start", "0.712", "--out-stop", "0.770",
                str(db / "tones_feat.xml"))
    assert r.returncode == 0, r.stderr
    blocks = _match_blocks(r.stdout, punch_out=True)
    assert 1 <= len(blocks) <= 10
    per_file = {}
    for b in blocks:
        per_file[b["file"]] = per_file.get(b["file"], 0) + 1
        lo = ((int(0.5 * 44100) + 256) // 512) * 512
        hi = ((int(0.75 * 44100) + 256) // 512 + 1) * 512
        assert lo <= b["stop"] - b["start"] <= hi, b
    assert max(per_file.values()) <= 4, per_file


def test_extraction_accepts_wav_input(tmp_path):
    """`-f` takes any supported container (the reference reads via
    libsndfile): identical audio as WAV and AIFF must yield identical
    feature files."""
    import numpy as np
    from strugatzki_tpu.io import audiofile as af
    from strugatzki_tpu.io.formats import AIFF, WAVE
    from strugatzki_tpu.cli import main as cli_main

    rng = np.random.default_rng(3)
    snd = (0.3 * rng.standard_normal((2, 44100))).astype(np.float32)
    db = tmp_path / "db"
    db.mkdir()
    for name, cont in (("a.aif", AIFF), ("b.wav", WAVE)):
        af.write(tmp_path / name, snd,
                 af.AudioFileSpec(cont, af.SampleFormat.INT16, 2, 44100.0))
        assert cli_main(["-f", "-d", str(db), str(tmp_path / name)]) == 0
    fa, _ = af.read(db / "a_feat.aif")
    fb, _ = af.read(db / "b_feat.aif")
    np.testing.assert_array_equal(fa, fb)


def test_span_requires_match_reference(demo):
    """-s / -x replicate the reference's require(span.nonEmpty) and the
    Span construction requirement (start <= stop)."""
    _, _, db, _ = demo
    meta = db / "mixed_feat.xml"
    r = run_cli("-s", "-d", str(db), "--span-start", "1.0",
                "--span-stop", "1.0", str(meta))
    assert r.returncode != 0 and "Span is empty" in (r.stderr + r.stdout)
    r = run_cli("-s", "-d", str(db), "--span-start", "2.0",
                "--span-stop", "1.0", str(meta))
    assert r.returncode != 0 and "requirement failed" in (r.stderr + r.stdout)


def test_java_float_formatting():
    from strugatzki_tpu.cli import to_db_str, to_percent_str
    assert to_percent_str(float("nan")) == "NaN"       # bare, no suffix
    assert to_percent_str(float("inf")) == "∞%"
    assert to_percent_str(0.5) == "50.0%"
    assert to_db_str(float("nan")) == "NaN"
    assert to_db_str(-1.0) == "NaN"                    # log10 of negative
    assert to_db_str(0.0) == "-∞ dB"
    assert to_db_str(float("inf")) == "∞ dB"
    assert to_db_str(2.0) == "6.0 dB"
