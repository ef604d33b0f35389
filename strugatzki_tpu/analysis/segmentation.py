"""Novelty-based segmentation processor.

TPU-native re-implementation of impl/FeatureSegmentationImpl.scala: the
sliding half-window correlation loop (:107-133) becomes one dense novelty
curve on device (kernels/corr.py::novelty_trace), and the break selection —
bounded sorted set, minSpacing collapse, duplicate-sim dedup — is replayed on
host in the reference's exact iteration order (:55-83,:121-124).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..config import Break, SegmentationConfig
from ..kernels import corr as K
from ..runtime.processor import Processor, ProcessorFactory
from .common import feat_to_full, full_to_feat, load_norm, normalized, FeatureSource
from .topk import SimSortedSet

__all__ = ["FeatureSegmentation", "segment_features"]


def segment_features(features: np.ndarray, norm, step_size: int,
                     config: SegmentationConfig,
                     check_aborted=lambda: None,
                     progress=lambda f: None) -> List[Break]:
    """Core segmentation on an in-memory feature matrix ``[C, T]``."""
    cfg = config
    num_frames = features.shape[1]

    af_start = max(0, full_to_feat(cfg.span.start, step_size)) \
        if cfg.span.has_start else 0
    af_stop = min(num_frames, full_to_feat(cfg.span.stop, step_size)) \
        if cfg.span.has_stop else num_frames
    af_len = af_stop - af_start

    half_win = full_to_feat(cfg.corr_len, step_size)
    win_len = half_win * 2
    if af_len <= 0 or half_win <= 0:
        return []

    # number of window evaluations: the reference's ring loop consumes
    # winLen frames up-front then 1/step (FeatureSegmentationImpl.scala:101-129)
    num_windows = af_len - win_len + 1 if af_len >= win_len else 1

    # normalized span data, zero-padded like the reference's freshly-allocated
    # buffer when afLen < winLen, then group-shifted (shift-invariant).
    # The device width is bucketed so sweeps over many lengths reuse a
    # handful of jit keys (remote compiles cost minutes, CLAUDE.md); the
    # appended zeros only produce extra windows past num_windows, sliced off
    from .correlation import _bucket
    xs = normalized(features[:, af_start:af_stop], norm)
    pad_to = _bucket((num_windows - 1) + win_len)
    if xs.shape[1] < pad_to:
        xs = np.pad(xs, ((0, 0), (0, pad_to - xs.shape[1])))
    xs, _, _ = K.shift_per_group(xs)

    check_aborted()
    sims = np.asarray(K.novelty_trace(jnp.asarray(xs), half_win,
                                      jnp.float32(cfg.temporal_weight))
                      )[:num_windows]
    check_aborted()

    # host replay of the selection loop (:55-83, :121-124)
    prio: SimSortedSet[Break] = SimSortedSet(descending=False)
    last_break: Break = None

    def add_break(b: Break) -> None:
        nonlocal last_break
        if last_break is not None and (b.pos - last_break.pos) < cfg.min_spacing:
            if last_break.sim > b.sim:
                prio.remove_sim(last_break.sim)
                prio.add(b.sim, b)
                last_break = b
        else:
            prio.add(b.sim, b)
            if len(prio) > cfg.num_breaks:
                prio.drop_last()
            last_break = b

    for t in range(num_windows):
        sim = float(sims[t])
        if len(prio) < cfg.num_breaks or sim < (prio.last_sim if len(prio) else 0.0):
            pos = feat_to_full(af_start + t + half_win, step_size)
            add_break(Break(sim, pos))
        if t % 4096 == 0:
            check_aborted()
            # reference quirk: progress DECREASES (left/afLen,
            # FeatureSegmentationImpl.scala:132); we report increasing done
            progress((t + 1) / num_windows)
    progress(1.0)
    return prio.items()


class FeatureSegmentation(ProcessorFactory):
    """``FeatureSegmentation.run(config, observer) -> Processor[list[Break]]``."""

    name = "segmentation"
    Config = SegmentationConfig

    @classmethod
    def _make_body(cls, config: SegmentationConfig):
        cfg = config.build()

        def body(proc: Processor):
            src = FeatureSource(cfg.meta_input)
            norm = load_norm(cfg.database_folder, src.meta.num_coeffs) \
                if cfg.normalize else None
            return segment_features(
                src.features, norm, src.step_size, cfg,
                check_aborted=proc.check_aborted,
                progress=proc.set_progress)

        return body
