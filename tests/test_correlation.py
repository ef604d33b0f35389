"""Correlation search tests: match-for-match comparison against a direct
transcription of FeatureCorrelationImpl.scala's selection logic (dense
indexing, float64 math), in both no-punch-out and punch-out modes."""

import numpy as np
import pytest

from conftest import FUZZ_SEEDS as _FUZZ, FUZZ_BASE as _FBASE, \
    soak_hygiene as _soak_hygiene

from strugatzki_tpu.analysis.correlation import correlate_database
from strugatzki_tpu.config import (CorrelationConfig, ExtractionConfig, Match,
                                   Punch)
from strugatzki_tpu.kernels import mathref as M
from strugatzki_tpu.span import Span, spacing

STEP = 512


def f2f(n):
    return (n + (STEP >> 1)) // STEP


def t2f(i):
    return i * STEP


# ---------------------------------------------------------------------------
# scala transcription (dense, float64)
# ---------------------------------------------------------------------------

def _jkey(sim):
    """java.lang.Float.compare total-order key (NaN collapses, sorts last)."""
    import struct as _s
    u = _s.unpack(">I", _s.pack(">f", sim))[0]
    if (u & 0x7F800000) == 0x7F800000 and (u & 0x007FFFFF):
        u = 0x7FC00000
    return u + 0x80000000 if u < 0x80000000 else 0xFFFFFFFF - u


class _Prio:
    """SortedSet[Match](MatchMinOrd): descending sim (Float.compare total
    order — NaN ranks best), dedup by comparator equality."""

    def __init__(self):
        self.items = []

    def add(self, m):
        if any(_jkey(x.sim) == _jkey(m.sim) for x in self.items):
            return
        self.items.append(m)
        self.items.sort(key=lambda x: -_jkey(x.sim))

    def remove_sim(self, sim):
        self.items = [x for x in self.items if _jkey(x.sim) != _jkey(sim)]

    @property
    def last(self):
        return self.items[-1]


def _trace(features, norm, tmpl_block, temp_weight, max_boost, scan_len):
    """Dense (sim, boost) trace in f64, mirroring the ring-buffer loop."""
    C, T = features.shape
    L = tmpl_block.shape[1]
    mean_t, std_t = M.stat(tmpl_block, 0, L, 0, 1)
    mean_s, std_s = M.stat(tmpl_block, 0, L, 1, C - 1)
    with np.errstate(divide="ignore"):
        ln_avg = np.log(np.float64(M.avg(tmpl_block[0], 0, L)))
    xn = features.astype(np.float32).copy()
    M.normalize(norm, xn, 0, T)
    W = scan_len - L + 1 if scan_len >= L else (1 if scan_len > 0 else 0)
    sims = np.zeros(W, np.float32)
    boosts = np.zeros(W, np.float32)
    for t in range(W):
        win = np.zeros((C, L), np.float32)
        # the scala loop reads only scan_len frames in total; the window
        # tail beyond that is the zero buffer even if the file has more
        # data (punch-out mode reserves minPunch frames)
        avail = xn[:, t:min(t + L, scan_len)]
        win[:, :avail.shape[1]] = avail
        with np.errstate(divide="ignore", invalid="ignore"):
            boost = np.float32(np.exp((ln_avg - np.log(np.float64(M.avg(win[0], 0, L)))) / 0.6))
        boosts[t] = boost
        if boost <= max_boost:
            bm_t, bs_t = M.stat(win, 0, L, 0, 1)
            bm_s, bs_s = M.stat(win, 0, L, 1, C - 1)
            st = M.correlate(tmpl_block[:1], mean_t, std_t, L, 1, win, bm_t, bs_t, 0, 0) \
                if temp_weight > 0 else np.float32(0)
            ss = M.correlate(tmpl_block[1:], mean_s, std_s, L, C - 1, win, bm_s, bs_s, 0, 1) \
                if temp_weight < 1 else np.float32(0)
            sims[t] = np.float32(st * np.float32(temp_weight)
                                 + ss * np.float32(1 - temp_weight))
    return sims, boosts


def _scala_reference_correlation(meta_in_feats, db, norm, cfg):
    """Transcription of FeatureCorrelationImpl.scala:32-412 over in-memory
    feature matrices.  ``db`` = list of (name, features)."""
    def read_tmpl(punch):
        start, stop = f2f(punch.span.start), f2f(punch.span.stop)
        block = np.zeros((meta_in_feats.shape[0], stop - start), np.float32)
        avail = meta_in_feats[:, start:min(stop, meta_in_feats.shape[1])]
        block[:, :avail.shape[1]] = avail
        M.normalize(norm, block, 0, stop - start)
        return block

    tmpl_in = read_tmpl(cfg.punch_in)
    tmpl_out = read_tmpl(cfg.punch_out) if cfg.punch_out else None
    Lin = tmpl_in.shape[1]
    min_p, max_p = f2f(cfg.min_punch), f2f(cfg.max_punch)

    all_prio = _Prio()

    for name, feats in db:
        entry = _Prio()
        last_match = [None]

        def has_space():
            return len(entry.items) < min(cfg.num_matches - len(all_prio.items),
                                          cfg.num_per_file)

        def low_sim():
            if entry.items:
                return entry.items[-1].sim
            if all_prio.items:
                return all_prio.items[-1].sim
            return 0.0

        def add(m):
            if last_match[0] is not None and \
                    spacing(m.punch, last_match[0].punch) < cfg.min_spacing:
                if last_match[0].sim < m.sim:
                    entry.remove_sim(last_match[0].sim)
                    entry.add(m)
                    last_match[0] = m
            else:
                entry.add(m)
                if len(entry.items) > cfg.num_per_file:
                    entry.items.pop()
                last_match[0] = m

        T = feats.shape[1]
        scan = T - (min_p if tmpl_out is not None else 0)
        sims_in, boosts_in = _trace(feats, norm, tmpl_in,
                                    cfg.punch_in.temporal_weight,
                                    cfg.max_boost, scan)
        if tmpl_out is None:
            for t in range(len(sims_in)):
                s = float(sims_in[t])
                if has_space() or s > low_sim():
                    add(Match(s, name, Span(t2f(t), t2f(t + Lin)),
                              float(boosts_in[t]), 1.0))
        else:
            if has_space():
                t_in_off = 0
            else:
                above = np.nonzero(sims_in > low_sim())[0]
                t_in_off = int(above[0]) if above.size else -1
            if t_in_off < 0 or len(sims_in) <= t_in_off:
                pass
            else:
                po0 = t_in_off + min_p
                t_out_size = T - po0
                Lout = tmpl_out.shape[1]
                if t_out_size >= Lout:
                    sims_out, boosts_out = _trace(
                        feats[:, po0:], norm, tmpl_out,
                        cfg.punch_out.temporal_weight, cfg.max_boost,
                        t_out_size)
                    w_out = len(sims_out)
                    for i in range(len(sims_in) - t_in_off):
                        in_sim = float(sims_in[t_in_off + i])
                        b_in = float(boosts_in[t_in_off + i])
                        low = low_sim()
                        hs = has_space()
                        # low² and inSim·outSim are Java FLOAT multiplies:
                        # round the products to f32 (the unrounded f64
                        # value flips the rounded result on ~13% of random
                        # pairs — the implementation and Scala agree on
                        # f32, so the oracle must too)
                        if in_sim > float(np.float32(low * low)):
                            n2 = min(t_out_size - i, max_p - min_p + 1, w_out - i)
                            po_off = t_in_off + i + min_p
                            for k in range(max(n2, 0)):
                                out_sim = float(sims_out[i + k])
                                with np.errstate(invalid="ignore"):
                                    # NaN for negative products is the
                                    # reference's own behavior (:370)
                                    s = float(np.float32(np.sqrt(np.float64(
                                        np.float32(in_sim * out_sim)))))
                                if hs or s > low:
                                    add(Match(s, name,
                                              Span(t2f(t_in_off + i), t2f(po_off + k)),
                                              b_in, float(boosts_out[i + k])))
                                    low = low_sim()
                                    hs = has_space()
        for m in entry.items:
            all_prio.add(m)
        all_prio.items = all_prio.items[:cfg.num_matches]
    return all_prio.items


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _make_db(seed=0, num_files=4, T=500, C=14):
    """DB of feature files; file 2 contains the punch material embedded."""
    rng = np.random.default_rng(seed)
    files = []
    for i in range(num_files):
        base = rng.uniform(0.3, 0.7, size=(C, 1))
        x = np.abs(base + 0.1 * rng.standard_normal((C, T))).astype(np.float32)
        files.append((f"db{i}.aif", x))
    # input: 200 frames, with punch span copied into db file 2 at offset 137
    inp = np.abs(0.5 + 0.1 * rng.standard_normal((C, 200))).astype(np.float32)
    files[2][1][:, 137:137 + 40] = inp[:, 20:60]
    return inp, files


def _run_ours(inp, files, cfg, norm=None, skip_nan=False):
    meta = ExtractionConfig(audio_input="in.aif", feature_output="mem",
                            num_coeffs=13, fft_size=1024, fft_overlap=2)
    entries = [(ExtractionConfig(audio_input=name, feature_output=name),
                (lambda f_=f: f_)) for name, f in files]

    import strugatzki_tpu.analysis.correlation as corr_mod
    orig = corr_mod.read_features
    corr_mod.read_features = lambda m: inp  # input features come from memory
    try:
        return correlate_database(meta, entries, norm, cfg, skip_nan=skip_nan)
    finally:
        corr_mod.read_features = orig


def _run_both(inp, files, cfg, norm=None):
    ref = _scala_reference_correlation(inp, files, norm, cfg)
    ours = _run_ours(inp, files, cfg, norm)
    return ours, ref


def _assert_same(ours, ref):
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        assert a.file == b.file, (a, b)
        assert a.punch == b.punch, (a, b)
        if np.isnan(b.sim):
            assert np.isnan(a.sim), (a, b)
        else:
            assert abs(a.sim - b.sim) < 3e-5, (a, b)
        assert abs(a.boost_in - b.boost_in) < 1e-4 * max(1, abs(b.boost_in))
        assert abs(a.boost_out - b.boost_out) < 1e-4 * max(1, abs(b.boost_out))


def test_no_punch_out_top1():
    inp, files = _make_db()
    cfg = CorrelationConfig(
        punch_in=Punch(Span(20 * STEP, 60 * STEP), 0.5),
        normalize=False, num_matches=1).build()
    ours, ref = _run_both(inp, files, cfg)
    _assert_same(ours, ref)
    # the planted copy must be found at the right offset
    assert ours[0].file == "db2.aif"
    assert ours[0].punch.start == 137 * STEP
    assert ours[0].sim > 0.99


def test_no_punch_out_topk_spacing():
    inp, files = _make_db(seed=5)
    cfg = CorrelationConfig(
        punch_in=Punch(Span(20 * STEP, 60 * STEP), 0.3),
        normalize=False, num_matches=5, num_per_file=2,
        min_spacing=10 * STEP).build()
    ours, ref = _run_both(inp, files, cfg)
    _assert_same(ours, ref)
    assert len(ours) == 5


def test_with_punch_out():
    inp, files = _make_db(seed=9, T=400)
    # also embed the punch-out span material later in db file 2
    files[2][1][:, 300:300 + 30] = inp[:, 100:130]
    cfg = CorrelationConfig(
        punch_in=Punch(Span(20 * STEP, 60 * STEP), 0.5),
        punch_out=Punch(Span(100 * STEP, 130 * STEP), 0.5),
        min_punch=80 * STEP, max_punch=200 * STEP,
        normalize=False, num_matches=3, num_per_file=3,
        min_spacing=0).build()
    ours, ref = _run_both(inp, files, cfg)
    # faithful mode reproduces the reference's NaN-poisoning quirk exactly
    _assert_same(ours, ref)

    # with the skip_nan extension, the planted punch must be found
    ours2 = _run_ours(inp, files, cfg, skip_nan=True)
    assert len(ours2) == 3
    assert all(np.isfinite(m.sim) for m in ours2)
    best = ours2[0]
    assert best.file == "db2.aif"
    # punch-in at 137, punch-out at 300: length 163 frames within [80, 200]
    assert best.punch.start == 137 * STEP
    assert best.punch.stop == 300 * STEP


def test_with_normalization():
    inp, files = _make_db(seed=11)
    all_feats = np.concatenate([f for _, f in files], axis=1)
    norm = np.stack([all_feats.min(axis=1) - 1e-3,
                     all_feats.max(axis=1) + 1e-3], axis=1).astype(np.float32)
    cfg = CorrelationConfig(
        punch_in=Punch(Span(20 * STEP, 60 * STEP), 0.5),
        normalize=True, num_matches=3, num_per_file=1).build()
    ours, ref = _run_both(inp, files, cfg, norm=norm)
    _assert_same(ours, ref)


def test_max_boost_gating():
    inp, files = _make_db(seed=13)
    # make file 0 much quieter -> boost above threshold -> sims zeroed
    files[0] = (files[0][0], (files[0][1] * np.array([[0.001]] + [[1.0]] * 13,
                                                     np.float32)))
    cfg = CorrelationConfig(
        punch_in=Punch(Span(20 * STEP, 60 * STEP), 0.5),
        normalize=False, num_matches=2, max_boost=4.0).build()
    ours, ref = _run_both(inp, files, cfg)
    _assert_same(ours, ref)
    assert all(m.file != "db0.aif" for m in ours)


@pytest.mark.parametrize("seed", range(_FBASE, _FBASE + (_FUZZ or 20)))
def test_fuzz_parity_with_transcription(seed):
    """Randomized configs and databases: the framework must agree with the
    reference transcription match-for-match across edge combinations
    (short files, punch-out, normalization, spacing, per-file caps,
    boost gating, degenerate weights)."""
    _soak_hygiene(seed)
    rng = np.random.default_rng(1000 + seed)
    C = 14
    num_files = int(rng.integers(1, 6))
    files = []
    for i in range(num_files):
        T = int(rng.integers(30, 400))
        base = rng.uniform(0.3, 0.7, size=(C, 1))
        x = np.abs(base + 0.12 * rng.standard_normal((C, T))).astype(np.float32)
        files.append((f"f{i}.aif", x))
    inp_len = int(rng.integers(80, 300))
    inp = np.abs(0.5 + 0.1 * rng.standard_normal((C, inp_len))).astype(np.float32)

    in_a = int(rng.integers(0, inp_len - 20))
    in_b = in_a + int(rng.integers(10, min(60, inp_len - in_a)))
    punch_out = None
    if rng.random() < 0.5 and inp_len - in_b > 15:
        o_a = in_b + int(rng.integers(0, (inp_len - in_b) // 2))
        o_b = o_a + int(rng.integers(5, max(6, inp_len - o_a)))
        punch_out = Punch(Span(o_a * STEP, min(o_b, inp_len) * STEP),
                          float(rng.choice([0.0, 0.4, 1.0])))

    norm = None
    if rng.random() < 0.5:
        allf = np.concatenate([f for _, f in files] + [inp], axis=1)
        norm = np.stack([allf.min(axis=1) - 1e-3, allf.max(axis=1) + 1e-3],
                        axis=1).astype(np.float32)

    min_p = int(rng.integers(5, 60))
    cfg = CorrelationConfig(
        punch_in=Punch(Span(in_a * STEP, in_b * STEP),
                       float(rng.choice([0.0, 0.5, 1.0]))),
        punch_out=punch_out,
        min_punch=min_p * STEP,
        max_punch=(min_p + int(rng.integers(0, 80))) * STEP,
        normalize=norm is not None,
        max_boost=float(rng.choice([1.5, 4.0, 8.0])),
        num_matches=int(rng.integers(1, 6)),
        num_per_file=int(rng.integers(1, 4)),
        min_spacing=int(rng.integers(0, 40)) * STEP,
    ).build()

    ours, ref = _run_both(inp, files, cfg, norm=norm)
    _assert_same(ours, ref)


def test_punch_out_tiny_file_zero_tail():
    """A file shorter than punchInLen + minPunch: the single punch-in
    window is zero-tailed at numFrames − minPunch even though the file has
    more frames (it never reads them).  NOTE the reference only guarantees
    zeros for the FIRST database file — afterwards its shared window
    buffer holds the previous file's stale frames (docs/PARITY.md
    divergence 9); we pin the reproducible zeros behavior."""
    rng = np.random.default_rng(77)
    C = 14
    inp = np.abs(0.5 + 0.1 * rng.standard_normal((C, 200))).astype(np.float32)
    tiny = np.abs(0.5 + 0.1 * rng.standard_normal((C, 70))).astype(np.float32)
    big = np.abs(0.5 + 0.1 * rng.standard_normal((C, 300))).astype(np.float32)
    files = [("tiny.aif", tiny), ("big.aif", big)]
    cfg = CorrelationConfig(
        punch_in=Punch(Span(20 * STEP, 80 * STEP), 0.5),   # L = 60
        punch_out=Punch(Span(100 * STEP, 130 * STEP), 0.5),
        min_punch=30 * STEP, max_punch=120 * STEP,          # tiny: scan = 40 < 60
        normalize=False, num_matches=4, num_per_file=2).build()
    ours, ref = _run_both(inp, files, cfg)
    _assert_same(ours, ref)


@pytest.mark.parametrize("seed",
                         range(31 + _FBASE, 31 + _FBASE + (_FUZZ or 3)))
def test_fuzz_varying_file_lengths_with_punch_out(seed):
    """Mixed file lengths through the chunked batch path (bucketed padding,
    per-file valid-prefix slicing, the scan < punchInLen zero-tail edge)
    must stay match-for-match with the sequential transcription."""
    _soak_hygiene(seed)
    rng = np.random.default_rng(seed)
    files = []
    # lengths straddle every regime: shorter than the punch-in template,
    # shorter than minPunch + template (single zero-tail window), and long
    lengths = [25, 60, 131, 222, 347, 489]
    rng.shuffle(lengths)
    for i, T in enumerate(lengths):
        base = rng.uniform(0.3, 0.7, size=(14, 1))
        x = np.abs(base + 0.1 * rng.standard_normal((14, T))).astype(np.float32)
        files.append((f"v{i}.aif", x))
    inp = np.abs(0.5 + 0.1 * rng.standard_normal((14, 200))).astype(np.float32)
    cfg = CorrelationConfig(
        punch_in=Punch(Span(20 * STEP, 55 * STEP), 0.5),
        punch_out=Punch(Span(120 * STEP, 150 * STEP), 0.5),
        min_punch=40 * STEP, max_punch=120 * STEP,
        normalize=False, num_matches=4, num_per_file=2,
        min_spacing=0).build()
    ours, ref = _run_both(inp, files, cfg)
    _assert_same(ours, ref)

    # and without punch-out (different scan-length regime per file)
    cfg2 = CorrelationConfig(
        punch_in=Punch(Span(20 * STEP, 55 * STEP), 0.5),
        normalize=False, num_matches=4, num_per_file=1,
        min_spacing=0).build()
    ours2, ref2 = _run_both(inp, files, cfg2)
    _assert_same(ours2, ref2)


def test_template_longer_than_every_file():
    """A chunk whose files are ALL shorter than the punch-in template: each
    file contributes the reference's single zero-tailed window (the device
    width must be padded up to the template, or the trace has a negative
    window count)."""
    rng = np.random.default_rng(123)
    C = 14
    files = [(f"s{i}.aif",
              np.abs(0.5 + 0.1 * rng.standard_normal((C, 30 + 7 * i)))
              .astype(np.float32)) for i in range(4)]
    inp = np.abs(0.5 + 0.1 * rng.standard_normal((C, 200))).astype(np.float32)
    cfg = CorrelationConfig(
        punch_in=Punch(Span(10 * STEP, 130 * STEP), 0.5),   # L = 120 > all
        min_punch=20 * STEP, max_punch=40 * STEP,
        normalize=False, num_matches=4, num_per_file=1).build()
    ours, ref = _run_both(inp, files, cfg, norm=None)
    _assert_same(ours, ref)
    assert len(ours) > 0          # every file offers its single window
