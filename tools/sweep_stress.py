"""Batch-sweep stress rehearsal (BASELINE.json config 5).

Synthesizes N multichannel sounds, runs the full pipeline — batch
extraction, --stats norm file, boosted punch correlation over the whole
database, resident-database query — and prints stage timings.  Exercises
chunking, file pressure and memory behavior at scale.

    STRUGATZKI_PLATFORM=cpu python tools/sweep_stress.py --files 300 --secs 10
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=300)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--keep", action="store_true")
    ns = ap.parse_args()

    import strugatzki_tpu as st
    from strugatzki_tpu.analysis.correlation import InputTemplate
    from strugatzki_tpu.io import audiofile as af
    from strugatzki_tpu.io.formats import AIFF
    from strugatzki_tpu.io.audiofile import AudioFileSpec, SampleFormat

    root = tempfile.mkdtemp(prefix="strug_sweep_")
    snd = os.path.join(root, "snd")
    db = os.path.join(root, "db")
    os.makedirs(snd)
    os.makedirs(db)
    sr = 44100
    rng = np.random.default_rng(0)
    n = int(ns.secs * sr)

    print(f"workdir {root}: {ns.files} files x {ns.secs}s stereo")
    t0 = time.perf_counter()
    freqs = rng.uniform(100, 4000, ns.files)
    t = np.arange(n) / sr
    for i in range(ns.files):
        sig = (0.3 * np.sin(2 * np.pi * freqs[i] * t)
               + 0.15 * rng.standard_normal(n))
        stereo = np.stack([sig, np.roll(sig, 97)]).astype(np.float32)
        af.write(os.path.join(snd, f"s{i:04d}.aif"), stereo,
                 AudioFileSpec(AIFF, SampleFormat.INT16, 2, float(sr)))
    print(f"synthesis: {time.perf_counter() - t0:.1f}s")

    # --- extraction over the whole directory (CLI path) -------------------
    t0 = time.perf_counter()
    from strugatzki_tpu.cli import feature_pre
    rc = feature_pre(["-d", db, snd])
    assert rc == 0
    el = time.perf_counter() - t0
    total_audio = ns.files * ns.secs
    print(f"extraction: {el:.1f}s for {total_audio:.0f}s audio "
          f"({total_audio / el:.0f}x realtime on this backend)")

    # --- stats -------------------------------------------------------------
    t0 = time.perf_counter()
    from strugatzki_tpu.cli import feature_stats
    rc = feature_stats(["-d", db])
    assert rc == 0
    print(f"stats: {time.perf_counter() - t0:.1f}s")

    # --- boosted punch correlation over the full DB ------------------------
    t0 = time.perf_counter()
    meta0 = os.path.join(db, "s0000_feat.xml")
    cfg = st.CorrelationConfig(
        database_folder=db, meta_input=meta0,
        punch_in=st.Punch(st.Span(2 * sr, 4 * sr), 0.5),
        num_matches=10, num_per_file=2, min_spacing=sr,
        max_boost=8.0)
    matches = st.FeatureCorrelation.run(cfg).result()
    el = time.perf_counter() - t0
    print(f"exact search: {el:.1f}s over {ns.files - 1} files; "
          f"top sim {matches[0].sim:.3f} in {os.path.basename(matches[0].file)}")

    # --- resident database queries -----------------------------------------
    t0 = time.perf_counter()
    fdb = st.FeatureDatabase.from_folder(db)
    load = time.perf_counter() - t0
    from strugatzki_tpu.analysis.common import load_norm, read_features
    meta = st.ExtractionConfig.from_xml_file(meta0)
    feats = read_features(meta)
    norm = load_norm(db, 13)
    tmpl = InputTemplate.from_features(feats, norm, 172, 344)
    t0 = time.perf_counter()
    res = fdb.query(tmpl, k=2)
    q = time.perf_counter() - t0
    print(f"resident DB: load {load:.1f}s ({fdb.num_files} files), "
          f"query {q * 1000:.0f}ms; best file "
          f"{os.path.basename(res.files[int(np.argmax(res.sims[:, 0]))])}")

    if not ns.keep:
        shutil.rmtree(root)
    print("ok")


if __name__ == "__main__":
    main()
