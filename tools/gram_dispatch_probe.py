"""Measure where the self-similarity gram pipeline spends wall-clock on the
relay-attached chip.

Theory under test (round 4): the giant renders (17.7 min at the 46340
ceiling) are dominated neither by MXU compute (~sub-second of matmuls),
nor by the u16 fetch (~2 min at the measured wire rate), nor by PNG
deflate — but by PER-GROUP DISPATCH OVERHEAD: every 8-pair group issues
~10 eager ``jnp.stack`` ops + 1 jit call through the relay, each paying a
command round-trip, and the matrix path fetches synchronously per group.

Phases timed (extent ~3833 synthetic input, NB = 8 blocks, 36 pairs,
5 groups — the same shape tools/selfsim_bench.py measures at 2.7 s):

  prep        extract_windows + window_stats per block (current path)
  dispatch    all groups dispatched, NO fetch (eager stacks + jit calls)
  drain       corner-forced completion of the last group
  fetch       np.asarray of every group result
  stack50     50 standalone eager jnp.stack dispatches (per-op RTT probe)
  injit       prototype: windows resident as ONE [NB,B,C,h] array + stats
              [NB,4,B]; per-dispatch gather of G groups INSIDE one jitted
              lax.map program (1 idx upload + 1 call per dispatch)

Diagnostics to stderr; one JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from strugatzki_tpu.kernels import corr as K  # noqa: E402
from strugatzki_tpu.analysis import self_similarity as SS  # noqa: E402


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    half_win = 86
    C = 14
    n = 3833
    decim = 1
    rng = np.random.default_rng(0)
    t_len = n * decim + 2 * half_win - 1
    x = rng.standard_normal((C, t_len)).astype(np.float32)
    tw = jnp.float32(0.5)

    log(f"backend: {jax.devices()[0].platform}; extent {n}")

    # --- current path: prep ------------------------------------------------
    t0 = time.perf_counter()
    n_, num_blocks, blocks1, blocks2 = SS._prep_window_blocks(
        x, x, half_win, decim)
    jax.block_until_ready(blocks1[-1][0])
    t_prep = time.perf_counter() - t0
    log(f"prep: {t_prep:.3f}s ({num_blocks} blocks)")

    pairs = [(bi, bj) for bi in range(num_blocks)
             for bj in range(bi, num_blocks)]
    groups = []
    for g0 in range(0, len(pairs), SS._PAIR_GROUP):
        g = pairs[g0:g0 + SS._PAIR_GROUP]
        groups.append(g + [g[-1]] * (SS._PAIR_GROUP - len(g)))

    # warm the jit key once (compile excluded from the timings)
    np.asarray(SS._dispatch_group(blocks1, blocks2, groups[0], tw))

    # --- current path: dispatch-only, then fetch ---------------------------
    t0 = time.perf_counter()
    outs = [SS._dispatch_group(blocks1, blocks2, g, tw) for g in groups]
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(outs[-1])
    np.asarray(outs[-1][0, 0, 0])
    t_drain = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetched = [np.asarray(o) for o in outs]
    t_fetch = time.perf_counter() - t0
    log(f"dispatch {len(groups)} groups: {t_disp:.3f}s; drain {t_drain:.3f}s; "
        f"fetch {t_fetch:.3f}s "
        f"({sum(f.nbytes for f in fetched) / 1e6:.1f} MB f32)")

    # --- per-op probe: 50 standalone eager stacks ---------------------------
    srcs = [blocks1[i % num_blocks][0] for i in range(8)]
    t0 = time.perf_counter()
    last = None
    for _ in range(50):
        last = jnp.stack(srcs)
    jax.block_until_ready(last)
    t_stack = time.perf_counter() - t0
    log(f"50 eager stacks of [8,512,{C},{2 * half_win}]: {t_stack:.3f}s "
        f"({t_stack / 50 * 1e3:.1f} ms/op)")

    # --- prototype: resident stacked arrays + in-jit gather ----------------
    # (stack the SAME per-block windows/stats the current path built — two
    # eager ops at prep time instead of ~10 eager stacks per group)
    t0 = time.perf_counter()
    win_all = jnp.stack([b[0] for b in blocks1])
    stats_all = jnp.stack([jnp.stack(b[1]) for b in blocks1])  # [NB, 4, B]
    stats_all = jnp.transpose(stats_all, (1, 0, 2))            # [4, NB, B]
    jax.block_until_ready(stats_all)
    log(f"prototype restack: {time.perf_counter() - t0:.3f}s")

    @partial(jax.jit, static_argnames=("num_temporal",))
    def gram_groups(win_all, stats_all, idx, tw, num_temporal: int = 1):
        # idx: [G, 2, gsize] int32 — block ids per stacked pair group
        def one(ij):
            wi = win_all[ij[0]]
            wj = win_all[ij[1]]
            sti = tuple(stats_all[t][ij[0]] for t in range(4))
            stj = tuple(stats_all[t][ij[1]] for t in range(4))
            return SS._gram_group_core(wi, wj, sti, stj, tw,
                                       num_temporal=num_temporal)
        return jax.lax.map(one, idx)

    G = 4
    idx_np = np.zeros((len(groups), 2, SS._PAIR_GROUP), np.int32)
    for k, g in enumerate(groups):
        idx_np[k, 0] = [a for a, _ in g]
        idx_np[k, 1] = [b for _, b in g]
    pad_g = (-len(groups)) % G
    if pad_g:
        idx_np = np.concatenate([idx_np, np.repeat(idx_np[-1:], pad_g, 0)])

    # warm compile
    t0 = time.perf_counter()
    np.asarray(gram_groups(win_all, stats_all, jnp.asarray(idx_np[:G]), tw))
    log(f"in-jit gather program compile+first: {time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    outs2 = [gram_groups(win_all, stats_all, jnp.asarray(idx_np[k:k + G]), tw)
             for k in range(0, len(idx_np), G)]
    fetched2 = [np.asarray(o) for o in outs2]
    t_injit = time.perf_counter() - t0
    log(f"in-jit gather dispatch+fetch ({len(outs2)} calls of G={G}): "
        f"{t_injit:.3f}s")

    # value parity: prototype == current path, bitwise
    ref = np.concatenate(fetched)
    got = np.concatenate(fetched2).reshape(-1, SS._BLOCK, SS._BLOCK)[:len(ref)]
    assert np.array_equal(ref, got, equal_nan=True), "prototype != current"
    log("prototype bitwise-equal to current path")

    print(json.dumps({
        "metric": "gram dispatch probe (extent 3833)",
        "prep_s": round(t_prep, 3), "dispatch_s": round(t_disp, 3),
        "drain_s": round(t_drain, 3), "fetch_s": round(t_fetch, 3),
        "stack_ms_per_op": round(t_stack / 50 * 1e3, 1),
        "injit_total_s": round(t_injit, 3)}))


if __name__ == "__main__":
    main()
