"""Tests for FeatureStats (vs a line-by-line transcription), SelfSimilarity
(matrix parity + PNG output) and CrossSimilarity (template detection)."""

import math
import os

import numpy as np

from strugatzki_tpu.analysis.feature_stats import FeatureStats, stats_for_file
from strugatzki_tpu.analysis.self_similarity import (SelfSimilarity,
                                                     render_image,
                                                     self_similarity_matrix)
from strugatzki_tpu.analysis.cross_similarity import CrossSimilarity
from strugatzki_tpu.config import (CrossSimilarityConfig, ExtractionConfig,
                                   SelfSimilarityConfig)
from strugatzki_tpu.io import audiofile as af
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.kernels import mathref as M


def _write_feat(path, data, rate=44100 / 512):
    af.write(path, data.astype(np.float32),
             af.feature_spec(data.shape[0], rate))


def _write_meta(meta_path, audio, feat):
    ExtractionConfig(audio_input=str(audio), feature_output=str(feat),
                     meta_output=str(meta_path)).save_xml(meta_path)


# ---------------------------------------------------------------------------
# stats
# ---------------------------------------------------------------------------

def _scala_stats(data):
    """Transcription of FeatureStatsImpl.body1 (:56-140), scalar — keeping
    the JVM's float widths: mins/maxs/d are Scala Float, the mean is a
    Double accumulation, and the pass-2 quotient ``(f - min) / d`` is an
    all-Float expression (:106) widened to Double only for math.pow."""
    num_ch, n = data.shape
    mins32 = [np.float32(data[ch].min()) for ch in range(num_ch)]
    maxs32 = [np.float32(data[ch].max()) for ch in range(num_ch)]
    d32 = [np.float32(maxs32[ch] - mins32[ch]) for ch in range(num_ch)]
    sums = [float(data[ch].astype(np.float64).sum()) for ch in range(num_ch)]
    log05 = math.log(0.5)
    skews, p01, p99 = [], [], []
    for ch in range(num_ch):
        mean = sums[ch] / n
        mn = (mean - float(mins32[ch])) / float(d32[ch])
        skews.append(log05 / math.log(mn))
    for ch in range(num_ch):
        cp = [0] * 2048
        for f in data[ch]:
            q32 = np.float32(np.float32(f - mins32[ch]) / d32[ch])
            norm = int(float(q32) ** skews[ch] * 2047 + 0.5)
            cp[norm] += 1
        p01n = int(n * 0.01)
        p99n = int(n * 0.99)
        cnt = i = 0
        while cnt < p01n:
            cnt += cp[i]
            i += 1
        skew_r = 1.0 / skews[ch]
        p01.append((i / 2048.0) ** skew_r * float(d32[ch]) + float(mins32[ch]))
        while cnt < p99n:
            cnt += cp[i]
            i += 1
        p99.append((i / 2048.0) ** skew_r * float(d32[ch]) + float(mins32[ch]))
    return np.array(p01), np.array(p99)


def test_stats_matches_transcription(tmp_path):
    rng = np.random.default_rng(0)
    data = np.abs(0.5 + 0.2 * rng.standard_normal((4, 3000))).astype(np.float32)
    p = tmp_path / "a_feat.aif"
    _write_feat(p, data)
    p01, p99 = stats_for_file(p)
    r01, r99 = _scala_stats(data)
    np.testing.assert_allclose(p01, r01, atol=1e-9)
    np.testing.assert_allclose(p99, r99, atol=1e-9)
    # robust percentiles bracket the bulk of the data
    for ch in range(4):
        assert p01[ch] <= np.percentile(data[ch], 3)
        assert p99[ch] >= np.percentile(data[ch], 97)


def test_stats_chunked_accumulation_bit_equal(tmp_path, monkeypatch):
    """The chunked mean/histogram passes (bounding RAM to O(chunk)) must be
    BIT-equal to the unchunked computation: the running f64 sum rides as
    the seeded cumsum's first column, preserving the exact left-to-right
    association, and histogram counts are associative."""
    import strugatzki_tpu.analysis.feature_stats as FS

    rng = np.random.default_rng(17)
    data = np.abs(0.5 + 0.2 * rng.standard_normal((3, 5000))
                  ).astype(np.float32)
    p = tmp_path / "c_feat.aif"
    _write_feat(p, data)
    big01, big99 = stats_for_file(p)        # one chunk covers everything
    monkeypatch.setattr(FS, "_CHUNK", 257)  # ragged many-chunk split
    small01, small99 = stats_for_file(p)
    np.testing.assert_array_equal(big01, small01)
    np.testing.assert_array_equal(big99, small99)


def test_stats_abort_cancels_queued_files(tmp_path, monkeypatch):
    """An abort must not wait for the whole queued database: queued
    futures are cancelled, so only the in-flight files finish (the old
    ex.map exit waited for every one of the queued files)."""
    import threading

    import strugatzki_tpu.analysis.feature_stats as FS
    from strugatzki_tpu.runtime.processor import Aborted

    n_files = 40
    processed = []
    first_done = threading.Event()
    abort_sent = threading.Event()      # deterministic: after the first
    # completion every in-flight worker parks here until the test has
    # called abort(), so the queued bulk can never race past the abort

    real = FS.stats_for_file

    def slow(path):
        if first_done.is_set():
            abort_sent.wait(timeout=30)
        out = real(path)
        processed.append(path)
        first_done.set()
        return out

    monkeypatch.setattr(FS, "stats_for_file", slow)
    rng = np.random.default_rng(3)
    paths = []
    for i in range(n_files):
        d = np.abs(0.5 + 0.1 * rng.standard_normal((2, 400))
                   ).astype(np.float32)
        p = tmp_path / f"f{i}_feat.aif"
        _write_feat(p, d)
        paths.append(str(p))

    proc = FeatureStats.run(paths)
    assert first_done.wait(timeout=60)
    proc.abort()
    abort_sent.set()
    res = proc.ready(timeout=60)
    assert isinstance(res.failure, Aborted)
    # in-flight work (≤ pool width) may finish; the queued bulk must not
    assert len(processed) < n_files


def test_stats_across_files(tmp_path):
    rng = np.random.default_rng(1)
    d1 = np.abs(0.5 + 0.1 * rng.standard_normal((3, 2000))).astype(np.float32)
    d2 = np.abs(0.9 + 0.3 * rng.standard_normal((3, 2000))).astype(np.float32)
    p1, p2 = tmp_path / "x_feat.aif", tmp_path / "y_feat.aif"
    _write_feat(p1, d1)
    _write_feat(p2, d2)
    res = FeatureStats.run([str(p1), str(p2)]).result(timeout=60)
    assert len(res) == 3
    a1, b1 = stats_for_file(p1)
    a2, b2 = stats_for_file(p2)
    for ch in range(3):
        assert res[ch][0] == min(a1[ch], a2[ch])
        assert res[ch][1] == max(b1[ch], b2[ch])


# ---------------------------------------------------------------------------
# self-similarity
# ---------------------------------------------------------------------------

def test_selfsim_matrix_matches_mathref():
    rng = np.random.default_rng(3)
    x = np.abs(0.5 + 0.15 * rng.standard_normal((5, 160))).astype(np.float32)
    h, d = 20, 3
    xs, _, _ = K.shift_per_group(x)
    sims = self_similarity_matrix(xs, xs, h, d, 0.5)
    n = (160 - 2 * h + 1) // d
    assert sims.shape == (n, n)
    for i in range(0, n, 7):
        for j in range(i, n, 11):
            win = np.concatenate([x[:, i * d:i * d + h],
                                  x[:, j * d:j * d + h]], axis=1)
            st = M.correlate_half(1, h, win, 0, 0)
            ss = M.correlate_half(4, h, win, 0, 1)
            ref = st * 0.5 + ss * 0.5
            assert abs(sims[i, j] - ref) < 2e-5
    np.testing.assert_allclose(np.diag(sims), 1.0, atol=1e-4)


def test_selfsim_processor_writes_png(tmp_path):
    rng = np.random.default_rng(4)
    a = 0.5 + 0.05 * rng.standard_normal((14, 150))
    b = 0.7 + 0.05 * rng.standard_normal((14, 150))
    feats = np.abs(np.concatenate([a, b], axis=1)).astype(np.float32)
    feat_p = tmp_path / "p_feat.aif"
    meta_p = tmp_path / "p_feat.xml"
    _write_feat(feat_p, feats)
    _write_meta(meta_p, tmp_path / "p.aif", feat_p)

    out = tmp_path / "out.png"
    cfg = SelfSimilarityConfig(
        meta_input=str(meta_p), image_output=str(out),
        corr_len=20 * 512, decimation=2, normalize=False)
    SelfSimilarity.run(cfg).result(timeout=120)
    raw = out.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # decode via zlib to check dimensions
    import struct, zlib
    w, hh = struct.unpack(">II", raw[16:24])
    n = (300 - 40 + 1) // 2
    assert (w, hh) == (n, n)
    pix = zlib.decompress(raw[raw.index(b"IDAT") + 4:raw.rindex(b"IEND") - 4])
    img = np.frombuffer(pix, np.uint8).reshape(hh, 1 + w * 3)[:, 1:].reshape(hh, w, 3)
    # block-diagonal structure: the two homogeneous sections are bright,
    # cross blocks darker; diagonal brightest
    ys = hh - 1 - np.arange(n)  # y flip
    diag_mean = img[ys, np.arange(n)].mean()
    cross = img[ys[int(n * 0.75)], int(n * 0.25)].mean()
    assert diag_mean > 200
    assert cross < diag_mean - 40


def test_render_image_orientation():
    sims = np.zeros((3, 3), np.float32)
    sims[0, 2] = 1.0
    sims[2, 0] = 1.0
    img = render_image(sims, "gray", 1.0, 1.0, False)
    # cell (i=0, j=2) → x=0, y = extent−1−2 = 0 → top-left bright
    assert img[0, 0, 0] == 255
    assert img[2, 2, 0] == 255  # mirrored cell (2,0) → x=2,y=2


# ---------------------------------------------------------------------------
# cross-similarity
# ---------------------------------------------------------------------------

def test_cross_similarity_detects_template(tmp_path):
    rng = np.random.default_rng(5)
    long = np.abs(0.5 + 0.12 * rng.standard_normal((14, 400))).astype(np.float32)
    tmpl = long[:, 250:290].copy()

    fl, ml = tmp_path / "long_feat.aif", tmp_path / "long_feat.xml"
    ft, mt = tmp_path / "tmpl_feat.aif", tmp_path / "tmpl_feat.xml"
    _write_feat(fl, long)
    _write_feat(ft, tmpl)
    _write_meta(ml, tmp_path / "long.aif", fl)
    _write_meta(mt, tmp_path / "tmpl.aif", ft)

    out = tmp_path / "sims.aif"
    cfg = CrossSimilarityConfig(
        meta_input1=str(mt), meta_input2=str(ml),
        normalize=False)
    cfg.set_audio_output(str(out))
    CrossSimilarity.run(cfg).result(timeout=120)

    sims, spec = af.read(out)
    assert spec.num_channels == 1
    assert spec.num_frames == 400 - 40 + 1
    # rate taken from meta_input1's feature file
    assert abs(spec.sample_rate - 44100 / 512) < 1e-4
    assert int(np.argmax(sims[0])) == 250
    assert sims[0, 250] > 0.999


def test_cross_similarity_mesh_sequence_parallel(tmp_path):
    """With ``CrossSimilarity.mesh`` set the sliding trace runs
    sequence-parallel (time-axis slabs + halo over the mesh) and must
    match the single-device output within the sequence-parallel budget
    (per-shard FFT lengths differ → not bitwise; 3e-5 like the
    sharded_long_file_trace tests)."""
    from strugatzki_tpu.parallel.sweep import make_files_mesh

    rng = np.random.default_rng(6)
    long = np.abs(0.5 + 0.12 * rng.standard_normal((14, 500))
                  ).astype(np.float32)
    tmpl = long[:, 310:350].copy()
    fl, ml = tmp_path / "long_feat.aif", tmp_path / "long_feat.xml"
    ft, mt = tmp_path / "tmpl_feat.aif", tmp_path / "tmpl_feat.xml"
    _write_feat(fl, long)
    _write_feat(ft, tmpl)
    _write_meta(ml, tmp_path / "long.aif", fl)
    _write_meta(mt, tmp_path / "tmpl.aif", ft)

    def run(out):
        cfg = CrossSimilarityConfig(meta_input1=str(mt), meta_input2=str(ml),
                                    normalize=False)
        cfg.set_audio_output(str(out))
        CrossSimilarity.run(cfg).result(timeout=120)
        return af.read(out)[0][0]

    s_single = run(tmp_path / "single.aif")
    CrossSimilarity.mesh = make_files_mesh()
    try:
        s_mesh = run(tmp_path / "mesh.aif")
    finally:
        CrossSimilarity.mesh = None
    assert s_mesh.shape == s_single.shape == (500 - 40 + 1,)
    np.testing.assert_allclose(s_mesh, s_single, rtol=0, atol=3e-5)
    assert int(np.argmax(s_mesh)) == 310


def test_selfsim_cross_mode_two_files(tmp_path):
    """input2 switches to cross-mode: matrix cell (i,j) correlates file-1's
    window i against file-2's window j over min(len1, len2) frames."""
    rng = np.random.default_rng(8)
    a = np.abs(0.5 + 0.1 * rng.standard_normal((14, 160))).astype(np.float32)
    b = np.abs(0.5 + 0.1 * rng.standard_normal((14, 120))).astype(np.float32)
    b[:, 40:70] = a[:, 10:40]  # plant a's window region inside b
    fa, fb = tmp_path / "a_feat.aif", tmp_path / "b_feat.aif"
    _write_feat(fa, a)
    _write_feat(fb, b)
    ma, mb = tmp_path / "a_feat.xml", tmp_path / "b_feat.xml"
    _write_meta(ma, tmp_path / "a.aif", fa)
    _write_meta(mb, tmp_path / "b.aif", fb)

    from strugatzki_tpu.config import SelfSimilarityConfig
    out = tmp_path / "cross.png"
    cfg = SelfSimilarityConfig(
        meta_input=str(ma), meta_input2=str(mb), image_output=str(out),
        corr_len=15 * 512, decimation=1, normalize=False,
        colors="gray")
    SelfSimilarity.run(cfg).result(timeout=300)
    import struct, zlib
    raw = out.read_bytes()
    w, h = struct.unpack(">II", raw[16:24])
    # halfWin = fullToFeat(15*512) = 15, winLen = 30; extent bounded by
    # min(len1, len2) = 120
    n = 120 - 30 + 1
    assert (w, h) == (n, n)
    pix = zlib.decompress(raw[raw.index(b"IDAT") + 4:raw.rindex(b"IEND") - 4])
    img = np.frombuffer(pix, np.uint8).reshape(h, 1 + w * 3)[:, 1:].reshape(h, w, 3)
    # cell (i=10, j=40) should be bright (planted correspondence):
    # pixel x=i, y = n−1−j
    assert img[n - 1 - 40, 10, 0] > 200


def test_selfsim_mismatched_settings_rejected(tmp_path):
    rng = np.random.default_rng(9)
    a = np.abs(rng.standard_normal((14, 100))).astype(np.float32)
    fa = tmp_path / "a_feat.aif"
    _write_feat(fa, a)
    ma, mb = tmp_path / "a_feat.xml", tmp_path / "b_feat.xml"
    ExtractionConfig(audio_input="a.aif", feature_output=str(fa)).save_xml(ma)
    ExtractionConfig(audio_input="b.aif", feature_output=str(fa),
                     fft_size=2048).save_xml(mb)
    from strugatzki_tpu.config import SelfSimilarityConfig
    cfg = SelfSimilarityConfig(meta_input=str(ma), meta_input2=str(mb),
                               image_output=str(tmp_path / "x.png"),
                               normalize=False)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        SelfSimilarity.run(cfg).result(timeout=60)


def test_cross_similarity_swaps_longer_template(tmp_path):
    """When input1 is LONGER, input2 becomes the template; output length is
    len1 − len2 + 1 and the rate still comes from input1's feature file
    (CrossSimilarityImpl.scala:87-94)."""
    rng = np.random.default_rng(10)
    long = np.abs(0.5 + 0.12 * rng.standard_normal((14, 300))).astype(np.float32)
    short = long[:, 100:160].copy()
    f1, m1 = tmp_path / "long_feat.aif", tmp_path / "long_feat.xml"
    f2, m2 = tmp_path / "short_feat.aif", tmp_path / "short_feat.xml"
    _write_feat(f1, long, rate=22050 / 512)   # distinct rate for input1
    _write_feat(f2, short)
    _write_meta(m1, tmp_path / "l.aif", f1)
    _write_meta(m2, tmp_path / "s.aif", f2)
    out = tmp_path / "o.aif"
    cfg = CrossSimilarityConfig(meta_input1=str(m1), meta_input2=str(m2),
                                normalize=False)
    cfg.set_audio_output(str(out))
    CrossSimilarity.run(cfg).result(timeout=120)
    sims, spec = af.read(out)
    assert spec.num_frames == 300 - 60 + 1
    assert abs(spec.sample_rate - 22050 / 512) < 1e-4  # input1's rate
    assert int(np.argmax(sims[0])) == 100


def test_selfsim_span_restriction(tmp_path):
    """The span option restricts the matrix to fullToFeat-mapped frames
    (SelfSimilarityImpl.scala:65-73)."""
    from strugatzki_tpu.span import Span
    rng = np.random.default_rng(11)
    feats = np.abs(0.5 + 0.1 * rng.standard_normal((14, 300))).astype(np.float32)
    fp, mp = tmp_path / "s_feat.aif", tmp_path / "s_feat.xml"
    _write_feat(fp, feats)
    _write_meta(mp, tmp_path / "s.aif", fp)
    out = tmp_path / "s.png"
    cfg = SelfSimilarityConfig(
        meta_input=str(mp), image_output=str(out), normalize=False,
        corr_len=10 * 512, span=Span(50 * 512, 250 * 512))
    SelfSimilarity.run(cfg).result(timeout=120)
    import struct
    w, h = struct.unpack(">II", out.read_bytes()[16:24])
    # afLen = 200, winLen = 20 -> 181 windows
    assert (w, h) == (181, 181)


def test_palette_monotonic_brightness():
    from strugatzki_tpu.util.palette import apply_palette
    v = np.linspace(0, 1, 256)
    rgb = apply_palette(v).astype(np.int32)
    luma = 0.2126 * rgb[:, 0] + 0.7152 * rgb[:, 1] + 0.0722 * rgb[:, 2]
    # perceptually even ramp: luminance strictly rises overall
    assert luma[0] < 10 and luma[-1] > 240
    assert (np.diff(luma) >= -2).all()  # allow tiny local dips only


import pytest


@pytest.mark.parametrize("seed", range(6))
def test_cross_similarity_fuzz_vs_mathref(seed):
    """Randomized spans/lengths/norms: every output sample must equal the
    f64 mathref computation of the documented semantics (shorter span as
    template, len2−len1+1 windows, boost gate)."""
    rng = np.random.default_rng(3000 + seed)
    C = 14
    t1 = int(rng.integers(40, 300))
    t2 = int(rng.integers(40, 300))
    f1 = np.abs(0.5 + 0.12 * rng.standard_normal((C, t1))).astype(np.float32)
    f2 = np.abs(0.5 + 0.12 * rng.standard_normal((C, t2))).astype(np.float32)
    norm = None
    if rng.random() < 0.5:
        allf = np.concatenate([f1, f2], axis=1)
        norm = np.stack([allf.min(axis=1) - 1e-3, allf.max(axis=1) + 1e-3],
                        axis=1).astype(np.float32)
    w = float(rng.choice([0.0, 0.5, 1.0]))
    max_boost = float(rng.choice([2.0, 8.0]))

    import tempfile, os
    from strugatzki_tpu.span import Span
    d = tempfile.mkdtemp()
    try:
        p1, m1 = os.path.join(d, "a_feat.aif"), os.path.join(d, "a_feat.xml")
        p2, m2 = os.path.join(d, "b_feat.aif"), os.path.join(d, "b_feat.xml")
        _write_feat(p1, f1)
        _write_feat(p2, f2)
        _write_meta(m1, "a.aif", p1)
        _write_meta(m2, "b.aif", p2)
        out = os.path.join(d, "o.aif")
        cfg = CrossSimilarityConfig(meta_input1=m1, meta_input2=m2,
                                    temporal_weight=w, normalize=False,
                                    max_boost=max_boost)
        if norm is not None:
            af.write(os.path.join(d, "feat_norms.aif"), norm,
                     af.AudioFileSpec(num_channels=C, sample_rate=44100.0))
            cfg.database_folder = d
            cfg.normalize = True
        cfg.set_audio_output(out)
        CrossSimilarity.run(cfg).result(timeout=300)
        sims, _ = af.read(out)
        sims = sims[0]
    finally:
        import shutil
        shutil.rmtree(d)

    # f64 reference of the intended semantics
    a, b = (f1, f2) if t1 < t2 else (f2, f1)
    an = a.astype(np.float32).copy()
    bn = b.astype(np.float32).copy()
    M.normalize(norm, an, 0, an.shape[1])
    M.normalize(norm, bn, 0, bn.shape[1])
    L = an.shape[1]
    mean_t, std_t = M.stat(an, 0, L, 0, 1)
    mean_s, std_s = M.stat(an, 0, L, 1, C - 1)
    ln_avg = np.log(np.float64(M.avg(an[0], 0, L)))
    W = bn.shape[1] - L + 1
    assert len(sims) == W
    for t in range(0, W, max(1, W // 17)):
        win = bn[:, t:t + L]
        boost = np.float32(np.exp(
            (ln_avg - np.log(np.float64(M.avg(win[0], 0, L)))) / 0.6))
        if boost <= max_boost:
            bm_t, bs_t = M.stat(win, 0, L, 0, 1)
            bm_s, bs_s = M.stat(win, 0, L, 1, C - 1)
            st = M.correlate(an[:1], mean_t, std_t, L, 1, win, bm_t, bs_t, 0, 0) \
                if w > 0 else np.float32(0)
            ss = M.correlate(an[1:], mean_s, std_s, L, C - 1, win, bm_s, bs_s, 0, 1) \
                if w < 1 else np.float32(0)
            ref = np.float32(st * np.float32(w) + ss * np.float32(1 - w))
        else:
            ref = np.float32(0)
        assert abs(float(sims[t]) - float(ref)) < 3e-5, (seed, t)


def test_selfsim_rejects_illegal_color_settings(tmp_path):
    """Reference requires colorWarp > 0 and colorCeil > 0
    (SelfSimilarityImpl.scala:112-114)."""
    rng = np.random.default_rng(9)
    feats = np.abs(0.5 + 0.05 * rng.standard_normal((14, 120))).astype(np.float32)
    feat_p = tmp_path / "q_feat.aif"
    meta_p = tmp_path / "q_feat.xml"
    _write_feat(feat_p, feats)
    _write_meta(meta_p, tmp_path / "q.aif", feat_p)
    for bad in (dict(color_warp=-1.0), dict(color_ceil=0.0)):
        cfg = SelfSimilarityConfig(
            meta_input=str(meta_p), image_output=str(tmp_path / "o.png"),
            corr_len=10 * 512, normalize=False, **bad)
        with pytest.raises(ValueError):
            SelfSimilarity.run(cfg).result(timeout=60)


def test_selfsim_processor_mesh_bitexact_png(tmp_path):
    """Setting the SelfSimilarity.mesh classvar shards the gram over the
    virtual mesh through the factory path — byte-identical PNG."""
    from strugatzki_tpu.parallel.sweep import make_files_mesh

    rng = np.random.default_rng(11)
    feats = np.abs(0.5 + 0.1 * rng.standard_normal((14, 260))
                   ).astype(np.float32)
    feat_p = tmp_path / "m_feat.aif"
    meta_p = tmp_path / "m_feat.xml"
    _write_feat(feat_p, feats)
    _write_meta(meta_p, tmp_path / "m.aif", feat_p)
    cfg = SelfSimilarityConfig(
        meta_input=str(meta_p), image_output=str(tmp_path / "a.png"),
        corr_len=20 * 512, decimation=1, normalize=False)
    SelfSimilarity.run(cfg).result(timeout=120)
    cfg2 = cfg.build()
    object.__setattr__(cfg2, "image_output", str(tmp_path / "b.png"))
    SelfSimilarity.mesh = make_files_mesh()
    try:
        SelfSimilarity.run(cfg2).result(timeout=120)
    finally:
        SelfSimilarity.mesh = None
    assert (tmp_path / "a.png").read_bytes() == \
        (tmp_path / "b.png").read_bytes()


def test_selfsim_factory_streaming_branch(tmp_path, monkeypatch):
    """Above _STREAM_EXTENT the factory streams stripes straight to the
    PNG (round-4 wiring: progress sub-scope, extent-scaled deflate level,
    engine via _make_engine) — pixels must equal the matrix branch's
    exactly."""
    import strugatzki_tpu.analysis.self_similarity as SS
    from strugatzki_tpu.config import SelfSimilarityConfig

    rng = np.random.default_rng(11)
    a = np.abs(0.5 + 0.1 * rng.standard_normal((14, 160))).astype(np.float32)
    fa, ma = tmp_path / "a_feat.aif", tmp_path / "a_feat.xml"
    _write_feat(fa, a)
    _write_meta(ma, tmp_path / "a.aif", fa)
    cfg = dict(meta_input=str(ma), corr_len=15 * 512, decimation=1,
               normalize=False, colors="psycho")

    SelfSimilarity.run(SelfSimilarityConfig(
        image_output=str(tmp_path / "mat.png"), **cfg)).result(timeout=300)

    progress = []
    monkeypatch.setattr(SS, "_STREAM_EXTENT", 50)   # extent 131 > 50
    proc = SelfSimilarity.run(
        SelfSimilarityConfig(image_output=str(tmp_path / "str.png"), **cfg),
        observer=lambda ev: progress.append(ev))
    proc.result(timeout=300)

    import zlib
    def pixels(p):
        raw = p.read_bytes()
        return zlib.decompress(
            raw[raw.index(b"IDAT") + 4:raw.rindex(b"IEND") - 4])

    assert pixels(tmp_path / "str.png") == pixels(tmp_path / "mat.png")
    assert progress   # observer saw streaming progress events


def test_selfsim_factory_png_level_policy(tmp_path, monkeypatch):
    """The streaming branch's deflate level: auto = 6 for merely
    stream-sized extents, 1 above _FAST_DEFLATE_EXTENT; the
    ``SelfSimilarity.png_level`` classvar forces a level."""
    import strugatzki_tpu.analysis.self_similarity as SS
    from strugatzki_tpu.config import SelfSimilarityConfig

    rng = np.random.default_rng(12)
    a = np.abs(0.5 + 0.1 * rng.standard_normal((14, 160))).astype(np.float32)
    fa, ma = tmp_path / "a_feat.aif", tmp_path / "a_feat.xml"
    _write_feat(fa, a)
    _write_meta(ma, tmp_path / "a.aif", fa)
    cfg = dict(meta_input=str(ma), corr_len=15 * 512, decimation=1,
               normalize=False, colors="psycho")

    seen = []

    def stub(x1, x2, half_win, decim, tw, path, *args, **kw):
        seen.append(kw.get("png_level"))
        from strugatzki_tpu.util.png import write_png
        write_png(path, np.zeros((1, 1, 3), np.uint8))
        return 1

    monkeypatch.setattr(SS, "self_similarity_to_png", stub)
    monkeypatch.setattr(SS, "_STREAM_EXTENT", 50)   # extent 131 > 50

    def run():
        SelfSimilarity.run(SelfSimilarityConfig(
            image_output=str(tmp_path / "o.png"), **cfg)).result(timeout=300)

    run()                                                   # auto, small
    monkeypatch.setattr(SS, "_FAST_DEFLATE_EXTENT", 100)    # extent 131 >
    run()                                                   # auto, giant
    monkeypatch.setattr(SelfSimilarity, "png_level", 3)     # forced
    run()
    assert seen == [6, 1, 3]
