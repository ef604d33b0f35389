"""Segmentation tests: selection replay vs a direct transcription of the
reference loop (ring buffer + correlateHalf + sorted-set), and end-to-end
break detection."""

import numpy as np
import pytest

from strugatzki_tpu.analysis.segmentation import segment_features
from strugatzki_tpu.config import Break, SegmentationConfig
from strugatzki_tpu.kernels import mathref as M
from strugatzki_tpu.span import Span


def _scala_reference_segmentation(features, norm, step, cfg):
    """Line-by-line transcription of FeatureSegmentationImpl.scala:31-142
    (dense indexing instead of file reads; float64 math via mathref)."""
    def full_to_feat(n):
        return (n + (step >> 1)) // step

    def feat_to_full(i):
        return i * step

    num_frames = features.shape[1]
    af_start = max(0, full_to_feat(cfg.span.start)) if cfg.span.has_start else 0
    af_stop = min(num_frames, full_to_feat(cfg.span.stop)) if cfg.span.has_stop else num_frames
    af_len = af_stop - af_start
    half = full_to_feat(cfg.corr_len)
    win_len = half * 2
    w = np.float32(cfg.temporal_weight)

    num_coeffs = features.shape[0] - 1
    buf = np.zeros((features.shape[0], win_len), np.float32)

    # BreakMaxOrd is java.lang.Float.compare on the sim — a TOTAL order
    # (NaN == NaN sorts above +Inf, -0.0 < 0.0); raw Python float
    # equality would never dedup NaNs and misorders the edge values
    def _jkey(sim):
        import struct as _s
        u = _s.unpack(">I", _s.pack(">f", sim))[0]
        if (u & 0x7F800000) == 0x7F800000 and (u & 0x007FFFFF):
            u = 0x7FC00000          # canonical NaN (Float.floatToIntBits)
        return u + 0x80000000 if u < 0x80000000 else 0xFFFFFFFF - u

    prio = []  # list of Break, sorted by Float.compare ascending; unique
    last_break = None

    def add_break(b):
        nonlocal last_break, prio
        if last_break is not None and (b.pos - last_break.pos) < cfg.min_spacing:
            if last_break.sim > b.sim:
                prio = [x for x in prio
                        if _jkey(x.sim) != _jkey(last_break.sim)]
                if all(_jkey(x.sim) != _jkey(b.sim) for x in prio):
                    prio.append(b)
                    prio.sort(key=lambda x: _jkey(x.sim))
                last_break = b
        else:
            if all(_jkey(x.sim) != _jkey(b.sim) for x in prio):
                prio.append(b)
                prio.sort(key=lambda x: _jkey(x.sim))
                if len(prio) > cfg.num_breaks:
                    prio.pop()  # drop highest sim
            last_break = b

    left = af_len
    read_sz = win_len
    read_off = 0
    logical = 0
    pos_in = af_start
    while left > 0:
        chunk = min(left, read_sz)
        take = features[:, pos_in:pos_in + chunk].astype(np.float32).copy()
        M.normalize(norm, take, 0, chunk)
        end = read_off + chunk
        if end <= win_len:
            buf[:, read_off:end] = take
        else:
            k = win_len - read_off
            buf[:, read_off:] = take[:, :k]
            buf[:, :end - win_len] = take[:, k:]
        pos_in += chunk
        off = logical % win_len
        temporal = M.correlate_half(1, half, buf, off, 0) if w > 0 else np.float32(0)
        spectral = M.correlate_half(num_coeffs, half, buf, off, 1) if w < 1 else np.float32(0)
        sim = np.float32(temporal * w + spectral * (1 - w))
        highest = prio[-1].sim if prio else 0.0
        if len(prio) < cfg.num_breaks or sim < highest:
            add_break(Break(float(sim), feat_to_full(af_start + logical + half)))
        left -= chunk
        read_off = (read_off + chunk) % win_len
        logical += 1
        read_sz = 1
    return prio


def _features_with_sections(seed=0, T=600, C=6):
    rng = np.random.default_rng(seed)
    a = 0.5 + 0.08 * rng.standard_normal((C, T // 3))
    b = np.concatenate([0.3 + 0.08 * rng.standard_normal((1, T // 3)),
                        0.7 + 0.08 * rng.standard_normal((C - 1, T // 3))])
    c = 0.45 + 0.2 * rng.standard_normal((C, T - 2 * (T // 3)))
    return np.abs(np.concatenate([a, b, c], axis=1)).astype(np.float32)


def test_matches_scala_transcription():
    feats = _features_with_sections()
    step = 512
    cfg = SegmentationConfig(normalize=False, corr_len=20 * 512,
                             num_breaks=4, min_spacing=30 * 512).build()
    ours = segment_features(feats, None, step, cfg)
    ref = _scala_reference_segmentation(feats, None, step, cfg)
    assert len(ours) == len(ref) > 0
    for a, b in zip(ours, ref):
        assert a.pos == b.pos
        assert abs(a.sim - b.sim) < 2e-5


def test_matches_scala_transcription_with_norm_and_span():
    feats = _features_with_sections(seed=3)
    step = 512
    norm = np.stack([feats.min(axis=1) - 0.01, feats.max(axis=1) + 0.01],
                    axis=1).astype(np.float32)
    cfg = SegmentationConfig(normalize=True, corr_len=15 * 512,
                             num_breaks=3, min_spacing=20 * 512,
                             span=Span(50 * 512, 550 * 512)).build()
    ours = segment_features(feats, norm, step, cfg)
    ref = _scala_reference_segmentation(feats, norm, step, cfg)
    assert len(ours) == len(ref) > 0
    for a, b in zip(ours, ref):
        assert a.pos == b.pos
        assert abs(a.sim - b.sim) < 2e-5


def test_finds_section_boundaries():
    feats = _features_with_sections(seed=7, T=900)
    step = 512
    cfg = SegmentationConfig(normalize=False, corr_len=30 * 512,
                             num_breaks=2, min_spacing=60 * 512).build()
    breaks = segment_features(feats, None, step, cfg)
    positions = sorted(b.pos // step for b in breaks)
    # the two section cuts are at 300 and 600 feature frames
    assert abs(positions[0] - 300) < 20
    assert abs(positions[1] - 600) < 20


def test_short_span_single_window():
    feats = _features_with_sections(seed=1, T=50)
    cfg = SegmentationConfig(normalize=False, corr_len=40 * 512,
                             num_breaks=1, min_spacing=0).build()
    ours = segment_features(feats, None, 512, cfg)
    ref = _scala_reference_segmentation(feats, None, 512, cfg)
    assert len(ours) == len(ref) == 1
    assert ours[0].pos == ref[0].pos
    assert abs(ours[0].sim - ref[0].sim) < 2e-5


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_parity_with_transcription(seed):
    """Randomized spans, lengths, norms and break counts: break-for-break
    agreement with the reference loop transcription."""
    rng = np.random.default_rng(2000 + seed)
    C = int(rng.integers(3, 15))
    T = int(rng.integers(40, 700))
    base = rng.uniform(0.3, 0.7, size=(C, 1))
    feats = np.abs(base + 0.15 * rng.standard_normal((C, T))).astype(np.float32)
    step = 512

    norm = None
    if rng.random() < 0.5:
        norm = np.stack([feats.min(axis=1) - 1e-3, feats.max(axis=1) + 1e-3],
                        axis=1).astype(np.float32)

    span = Span.all()
    r = rng.random()
    if r < 0.25:
        a = int(rng.integers(0, T // 2)) * step
        b = int(rng.integers(T // 2, T + 50)) * step
        span = Span(a, b)
    elif r < 0.5:
        span = Span.from_(int(rng.integers(0, T // 2)) * step)
    elif r < 0.75:
        span = Span.until(int(rng.integers(T // 2, T + 50)) * step)

    cfg = SegmentationConfig(
        normalize=norm is not None,
        span=span,
        corr_len=int(rng.integers(2, 60)) * step,
        temporal_weight=float(rng.choice([0.0, 0.5, 1.0])),
        num_breaks=int(rng.integers(1, 8)),
        min_spacing=int(rng.integers(0, 50)) * step,
    ).build()

    ours = segment_features(feats, norm, step, cfg)
    ref = _scala_reference_segmentation(feats, norm, step, cfg)
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        assert a.pos == b.pos, (a, b, cfg)
        assert abs(a.sim - b.sim) < 3e-5
