"""Kernel parity tests: the JAX batched formulations must match the exact
float64 mirror of the reference math (kernels/mathref.py) to ≤1e-5, and the
mirror itself must satisfy the reference's invariants
(``correlate(a, a) == 1``, MathUtil.scala:98,195)."""

import numpy as np
import pytest

import jax.numpy as jnp

from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.kernels import mathref as M


def _features(C=14, T=400, seed=0):
    """Synthetic normalized-feature-like matrix: values roughly in [0,1]."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.2, 0.8, size=(C, 1))
    x = base + 0.15 * rng.standard_normal((C, T))
    return np.abs(x).astype(np.float32)


# ---------------------------------------------------------------------------
# mathref invariants
# ---------------------------------------------------------------------------

def test_correlate_self_is_one():
    x = _features()
    mean, std = M.stat(x, 0, 100, 0, 14)
    a = x[:, :100]
    sim = M.correlate(a, mean, std, 100, 14, x, mean, std, 0, 0)
    assert abs(sim - 1.0) < 1e-6


def test_correlate_half_identical_halves():
    h = 50
    x = _features(C=5, T=h)
    win = np.concatenate([x, x], axis=1)
    sim = M.correlate_half(5, h, win, 0, 0)
    assert abs(sim - 1.0) < 1e-6


def test_correlate_ring_rotation_invariance():
    """Modulo indexing: rotating the buffer must not change the result
    (MathUtil.scala:93,190)."""
    h = 64
    x = _features(C=3, T=2 * h, seed=3)
    sim0 = M.correlate_half(3, h, x, 0, 0)
    for rot in (17, 63, 100):
        rolled = np.roll(x, rot, axis=1)
        sim_r = M.correlate_half(3, h, rolled, (2 * h - rot) % (2 * h), 0)
        assert abs(sim_r - sim0) < 1e-6


def test_normalize_matches_reference_semantics():
    x = _features(C=3, T=10, seed=1)
    norm = np.array([[0.1, 0.9], [0.2, 0.2], [0.0, 1.0]], dtype=np.float32)
    y = x.copy()
    with np.errstate(divide="ignore", invalid="ignore"):
        M.normalize(norm, y, 0, 10)
    # channel 1 has min==max -> division by zero, inf/nan allowed
    assert np.isfinite(y[0]).all() and np.isfinite(y[2]).all()
    np.testing.assert_allclose(y[0], (x[0] - 0.1) / 0.8, rtol=1e-6)
    # None is a no-op
    z = x.copy()
    M.normalize(None, z, 0, 10)
    np.testing.assert_array_equal(z, x)


# ---------------------------------------------------------------------------
# sliding correlation vs mathref
# ---------------------------------------------------------------------------

def _reference_trace(x, t_start, L, temp_weight, max_boost):
    """Scalar double-precision reference of the punch-in loop
    (FeatureCorrelationImpl.scala:190-246) on dense data."""
    C, T = x.shape
    tmpl = x[:, t_start:t_start + L]
    mean_t, std_t = M.stat(tmpl, 0, L, 0, 1)
    mean_s, std_s = M.stat(tmpl, 0, L, 1, C - 1)
    ln_avg = np.log(np.float64(M.avg(tmpl[0], 0, L)))
    W = T - L + 1
    sims = np.zeros(W, np.float32)
    boosts = np.zeros(W, np.float32)
    for t in range(W):
        w = x[:, t:t + L]
        boost = np.float32(np.exp((ln_avg - np.log(np.float64(M.avg(w[0], 0, L)))) / 0.6))
        boosts[t] = boost
        if boost <= max_boost:
            bm_t, bs_t = M.stat(w, 0, L, 0, 1)
            bm_s, bs_s = M.stat(w, 0, L, 1, C - 1)
            st = M.correlate(tmpl[:1], mean_t, std_t, L, 1, w, bm_t, bs_t, 0, 0)
            ss = M.correlate(tmpl[1:], mean_s, std_s, L, C - 1, w, bm_s, bs_s, 0, 1)
            sims[t] = st * temp_weight + ss * (1 - temp_weight)
    return sims, boosts


@pytest.mark.parametrize("temp_weight", [0.0, 0.5, 1.0])
def test_correlation_trace_matches_reference(temp_weight):
    x = _features(C=14, T=300, seed=7)
    L = 40
    ref_sims, ref_boosts = _reference_trace(x, 50, L, temp_weight, max_boost=8.0)

    tmpl = x[:, 50:50 + L]
    tc_t, m_t, s_t = K.prepare_template(tmpl[:1])
    tc_s, m_s, s_s = K.prepare_template(tmpl[1:])
    ln_avg = float(np.log(np.float64(M.avg(tmpl[0], 0, L))))
    xs, shift_t, _ = K.shift_per_group(x)

    sims, boosts = K.correlation_trace(
        jnp.asarray(xs), jnp.asarray(tc_t), jnp.asarray(tc_s),
        jnp.float32(s_t), jnp.float32(s_s),
        jnp.float32(ln_avg), jnp.float32(shift_t),
        jnp.float32(temp_weight), jnp.float32(8.0))
    sims, boosts = np.asarray(sims), np.asarray(boosts)

    assert sims.shape == ref_sims.shape
    np.testing.assert_allclose(sims, ref_sims, atol=2e-5)
    np.testing.assert_allclose(boosts, ref_boosts, rtol=2e-5)
    # the matched position must be exactly the best and ~1.0
    assert np.argmax(ref_sims) == 50
    assert abs(sims[50] - 1.0) < 1e-4


@pytest.mark.parametrize("temp_weight", [0.0, 0.5, 1.0])
def test_correlation_trace_from_sums_matches_fft_trace(temp_weight):
    """The 2-irfft serving trace (forward spectra + window-sum prefix
    table) must agree with the FFT-formulated trace and the reference
    mirror — the sums path only changes HOW window statistics are
    computed (prefix-table slices vs irffts), not what they are."""
    x = _features(C=14, T=300, seed=7)
    L = 40
    ref_sims, ref_boosts = _reference_trace(x, 50, L, temp_weight,
                                            max_boost=8.0)
    tmpl = x[:, 50:50 + L]
    tc_t, _, s_t = K.prepare_template(tmpl[:1])
    tc_s, _, s_s = K.prepare_template(tmpl[1:])
    ln_avg = float(np.log(np.float64(M.avg(tmpl[0], 0, L))))
    xs, shift_t, _ = K.shift_per_group(x)

    xs_d = jnp.asarray(xs)
    X = K.forward_spectra(xs_d)
    sums = K.window_sum_table(xs_d)
    args = (jnp.asarray(tc_t), jnp.asarray(tc_s),
            jnp.float32(s_t), jnp.float32(s_s), jnp.float32(ln_avg),
            jnp.float32(shift_t), jnp.float32(temp_weight),
            jnp.float32(8.0))
    sims, boosts = K.correlation_trace_from_sums(
        X, sums, xs.shape[1], *args)
    sims, boosts = np.asarray(sims), np.asarray(boosts)
    np.testing.assert_allclose(sims, ref_sims, atol=2e-5)
    np.testing.assert_allclose(boosts, ref_boosts, rtol=2e-5)
    assert abs(sims[50] - 1.0) < 1e-4

    fft_sims, fft_boosts = K.correlation_trace(xs_d, *args)
    np.testing.assert_allclose(sims, np.asarray(fft_sims), atol=2e-5)
    np.testing.assert_allclose(boosts, np.asarray(fft_boosts), rtol=2e-5)


def test_window_sum_table_multi_temporal_rows():
    """num_temporal != 1 adds the channel-0 row the boost mean needs
    (calcBoost averages b(0) alone, FeatureCorrelationImpl.scala:73-78);
    the sums trace must then match the FFT trace's boosts exactly."""
    x = _features(C=6, T=160, seed=11)
    nt = 2
    L = 24
    tmpl = x[:, 30:30 + L]
    tc_t, _, s_t = K.prepare_template(tmpl[:nt])
    tc_s, _, s_s = K.prepare_template(tmpl[nt:])
    ln_avg = float(np.log(np.float64(M.avg(tmpl[0], 0, L))))
    xs, shift_t, _ = K.shift_per_group(x, num_temporal=nt)
    xs_d = jnp.asarray(xs)
    sums = K.window_sum_table(xs_d, num_temporal=nt)
    assert sums.shape == (5, xs.shape[1] + 1)
    args = (jnp.asarray(tc_t), jnp.asarray(tc_s),
            jnp.float32(s_t), jnp.float32(s_s), jnp.float32(ln_avg),
            jnp.float32(shift_t), jnp.float32(0.5), jnp.float32(8.0))
    sims, boosts = K.correlation_trace_from_sums(
        K.forward_spectra(xs_d), sums, xs.shape[1], *args,
        num_temporal=nt)
    fft_sims, fft_boosts = K.correlation_trace(xs_d, *args,
                                               num_temporal=nt)
    np.testing.assert_allclose(np.asarray(sims), np.asarray(fft_sims),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(boosts), np.asarray(fft_boosts),
                               rtol=2e-5)


def test_correlation_trace_boost_gate():
    """Windows needing more than max_boost get sim = 0
    (FeatureCorrelationImpl.scala:199-210)."""
    x = _features(C=4, T=200, seed=9)
    x[0, 100:140] *= 0.001  # very quiet region -> huge boost
    L = 40
    tmpl = x[:, 20:20 + L]
    tc_t, _, s_t = K.prepare_template(tmpl[:1])
    tc_s, _, s_s = K.prepare_template(tmpl[1:])
    ln_avg = float(np.log(np.float64(M.avg(tmpl[0], 0, L))))
    xs, shift_t, _ = K.shift_per_group(x)
    sims, boosts = K.correlation_trace(
        jnp.asarray(xs), jnp.asarray(tc_t), jnp.asarray(tc_s),
        jnp.float32(s_t), jnp.float32(s_s), jnp.float32(ln_avg),
        jnp.float32(shift_t), jnp.float32(0.5), jnp.float32(8.0))
    sims, boosts = np.asarray(sims), np.asarray(boosts)
    gated = boosts > 8.0
    assert gated.any()
    assert (sims[gated] == 0.0).all()


# ---------------------------------------------------------------------------
# novelty curve vs mathref
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("temp_weight", [0.0, 0.5, 1.0])
def test_novelty_trace_matches_reference(temp_weight):
    x = _features(C=6, T=250, seed=11)
    h = 30
    W = x.shape[1] - 2 * h + 1
    ref = np.zeros(W, np.float32)
    for t in range(W):
        win = x[:, t:t + 2 * h]
        st = M.correlate_half(1, h, win, 0, 0)
        ss = M.correlate_half(5, h, win, 0, 1)
        ref[t] = st * temp_weight + ss * (1 - temp_weight)

    xs, _, _ = K.shift_per_group(x)
    sims = np.asarray(K.novelty_trace(jnp.asarray(xs), h,
                                      jnp.float32(temp_weight)))
    assert sims.shape == ref.shape
    np.testing.assert_allclose(sims, ref, atol=2e-5)


def test_novelty_detects_boundary():
    """A hard texture change must minimize the novelty curve near the cut."""
    rng = np.random.default_rng(5)
    a = 0.5 + 0.1 * rng.standard_normal((6, 200))
    b = np.stack([0.2 + 0.1 * rng.standard_normal(200),
                  *(0.8 + 0.1 * rng.standard_normal((5, 200)))])
    x = np.concatenate([a, b], axis=1).astype(np.float32)
    xs, _, _ = K.shift_per_group(x)
    h = 40
    sims = np.asarray(K.novelty_trace(jnp.asarray(xs), h, jnp.float32(0.5)))
    cut_window = 200 - h  # window centered at the cut
    assert abs(int(np.argmin(sims)) - cut_window) < 10


# ---------------------------------------------------------------------------
# gram similarity vs mathref
# ---------------------------------------------------------------------------

def test_gram_block_matches_reference():
    x = _features(C=5, T=200, seed=13)
    h = 25
    starts = np.arange(0, 120, 10)
    ref = np.zeros((len(starts), len(starts)), np.float32)
    for i, si in enumerate(starts):
        for j, sj in enumerate(starts):
            win = np.concatenate([x[:, si:si + h], x[:, sj:sj + h]], axis=1)
            st = M.correlate_half(1, h, win, 0, 0)
            ss = M.correlate_half(4, h, win, 0, 1)
            ref[i, j] = st * 0.5 + ss * 0.5

    xs, _, _ = K.shift_per_group(x)
    xs_j = jnp.asarray(xs)
    wins = K.extract_windows(xs_j, jnp.asarray(starts), h)
    stats = K.window_stats(wins)
    sims = np.asarray(K.gram_similarity_block(wins, wins, stats, stats,
                                              jnp.float32(0.5)))
    np.testing.assert_allclose(sims, ref, atol=2e-5)
    # diagonal is the self-correlation of identical halves = 1
    np.testing.assert_allclose(np.diag(sims), 1.0, atol=1e-4)


def test_correlation_trace_multi_temporal_boost_uses_channel0():
    """With num_temporal > 1 the boost must still come from channel 0's
    window mean only (reference calcBoost averages b(0),
    FeatureCorrelationImpl.scala:73-78), not the whole temporal group."""
    from strugatzki_tpu.analysis.correlation import InputTemplate

    rng = np.random.default_rng(5)
    nt = 2
    feats = np.abs(0.5 + 0.1 * rng.standard_normal((6, 300))).astype(np.float32)
    # make channel 1 loud so a whole-group mean would differ strongly
    feats[1] *= 5.0
    L = 40
    tmpl = InputTemplate(feats[:, 50:50 + L].copy(), num_temporal=nt)
    xs, sh_t, _ = K.shift_per_group(feats, num_temporal=nt)
    sims, boosts = K.correlation_trace(
        jnp.asarray(xs), tmpl.device_temporal(), tmpl.device_spectral(),
        jnp.float32(tmpl.temporal_std), jnp.float32(tmpl.spectral_std),
        jnp.float32(tmpl.ln_avg_loudness), jnp.float32(sh_t),
        jnp.float32(0.5), jnp.float32(1e9), num_temporal=nt)
    boosts = np.asarray(boosts)
    for t in (0, 77, 200):
        expect = np.exp(
            (tmpl.ln_avg_loudness
             - np.log(np.float64(M.avg(feats[0], t, L)))) / 0.6)
        assert abs(boosts[t] - expect) < 1e-3 * max(1.0, expect), (
            t, boosts[t], expect)
