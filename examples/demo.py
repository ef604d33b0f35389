"""End-to-end library walkthrough.

Builds a small synthetic sound set, extracts features, computes database
statistics, and runs every analysis — correlation search (incl. the
device-resident serving database), segmentation, self-similarity image and
cross-similarity vector.

    STRUGATZKI_PLATFORM=cpu python examples/demo.py /tmp/strugatzki_demo
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import strugatzki_tpu as st
from strugatzki_tpu.io import audiofile as af
from strugatzki_tpu.io.formats import AIFF
from strugatzki_tpu.io.audiofile import AudioFileSpec, SampleFormat


def main(root: str) -> None:
    snd = os.path.join(root, "snd")
    db = os.path.join(root, "db")
    os.makedirs(snd, exist_ok=True)
    os.makedirs(db, exist_ok=True)
    sr = 44100

    # --- synthesize a tiny "database" of sounds ---------------------------
    rng = np.random.default_rng(0)
    t = np.arange(4 * sr) / sr
    sounds = {
        "bell": 0.4 * np.sin(2 * np.pi * 523 * t) * np.exp(-t % 1 * 4),
        "noise": 0.25 * rng.standard_normal(4 * sr),
        "drone": 0.3 * np.sin(2 * np.pi * 110 * t)
                 + 0.15 * np.sin(2 * np.pi * 165 * t),
    }
    # "collage" hides one second of the bell at 2.0s
    collage = 0.2 * rng.standard_normal(4 * sr)
    collage[2 * sr:3 * sr] = sounds["bell"][sr:2 * sr]
    sounds["collage"] = collage
    for name, x in sounds.items():
        af.write(os.path.join(snd, f"{name}.aif"),
                 np.asarray(x, np.float32)[None],
                 AudioFileSpec(AIFF, SampleFormat.INT16, 1, float(sr)))

    # --- extraction (audio → *_feat.aif + *_feat.xml) ---------------------
    for name in sounds:
        cfg = st.ExtractionConfig(
            audio_input=os.path.join(snd, f"{name}.aif"),
            feature_output=os.path.join(db, f"{name}_feat.aif"),
            meta_output=os.path.join(db, f"{name}_feat.xml"))
        st.FeatureExtraction.run(cfg).result()
        print(f"extracted {name}")

    # --- database statistics → feat_norms.aif -----------------------------
    paths = [os.path.join(db, n) for n in sorted(os.listdir(db))
             if n.endswith("_feat.aif")]
    spans = st.FeatureStats.run(paths).result()
    norms = np.array(spans, np.float32)          # [channels, (min, max)]
    af.write(os.path.join(db, st.NORMALIZE_NAME), norms,
             AudioFileSpec(AIFF, SampleFormat.FLOAT, len(spans), 44100.0))
    print(f"norms written ({len(spans)} channels)")

    # --- correlation search: find the bell's second 1..2s in the DB -------
    search = st.CorrelationConfig(
        database_folder=db,
        meta_input=os.path.join(db, "bell_feat.xml"),
        punch_in=st.Punch(st.Span(sr, 2 * sr), 0.5),
        num_matches=3)
    matches = st.FeatureCorrelation.run(search).result()
    for m in matches:
        print(f"match: {os.path.basename(m.file)} "
              f"@{m.punch.start / sr:.2f}s sim={m.sim:.3f}")

    # --- the serving path: resident database, repeated queries ------------
    fdb = st.FeatureDatabase.from_folder(db)
    from strugatzki_tpu.analysis.correlation import InputTemplate
    from strugatzki_tpu.analysis.common import load_norm, read_features
    meta = st.ExtractionConfig.from_xml_file(os.path.join(db, "bell_feat.xml"))
    tmpl = InputTemplate.from_features(
        read_features(meta), load_norm(db, 13), 86, 172)
    res = fdb.query(tmpl, k=2)
    print("resident-db best hits:",
          [(os.path.basename(f), int(fr), round(float(s), 3))
           for f, fr, s in zip(res.files, res.frames[:, 0], res.sims[:, 0])])

    # --- segmentation of the collage ---------------------------------------
    seg = st.SegmentationConfig(
        database_folder=db, meta_input=os.path.join(db, "collage_feat.xml"),
        corr_len=sr, num_breaks=2, min_spacing=sr // 2)
    for b in st.FeatureSegmentation.run(seg).result():
        print(f"break @{b.pos / sr:.2f}s sim={b.sim:.3f}")

    # --- self-similarity image ---------------------------------------------
    ss = st.SelfSimilarityConfig(
        database_folder=db, meta_input=os.path.join(db, "collage_feat.xml"),
        image_output=os.path.join(root, "collage_selfsim.png"),
        corr_len=sr // 2)
    st.SelfSimilarity.run(ss).result()
    print("self-similarity image:", os.path.join(root, "collage_selfsim.png"))

    # --- cross-similarity vector -------------------------------------------
    cs = st.CrossSimilarityConfig(
        database_folder=db,
        meta_input1=os.path.join(db, "bell_feat.xml"),
        meta_input2=os.path.join(db, "collage_feat.xml"),
        span1=st.Span(sr, 2 * sr))
    cs.set_audio_output(os.path.join(root, "bell_in_collage.aif"))
    st.CrossSimilarity.run(cs).result()
    sims, _ = af.read(os.path.join(root, "bell_in_collage.aif"))
    print(f"cross-similarity peak @frame {int(np.argmax(sims[0]))} "
          f"(expected ~{2 * sr // 512})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/strugatzki_demo")
