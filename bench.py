"""Benchmark: feature-extraction throughput (realtime multiple per chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.json): >= 1000x realtime extraction per chip;
``vs_baseline`` is value / 1000.  Extra diagnostics go to stderr.

The headline is the honest driver-visible number: host PCM16 audio in,
features out, through whatever link attaches the chip.  In this harness the
chip is reached over a tunneled relay whose measured wire rate for
incompressible payloads is ~20-40 MB/s (content-dependent: the relay
compresses, so constant test patterns appear 3-5x faster than real audio
— full experiment log in docs/BENCH_LINK.md).  That makes the pipeline
transfer-bound: the wire-implied ceiling (bandwidth / 88200 bytes-per-
audio-second) is printed alongside so every captured BENCH record carries
its own context.  Device-resident compute throughput (~23,000x realtime
after the dB->phon interpolation fix; ~70,000x net of dispatch RTT) is
reported too; on a production PCIe-attached chip
(>= 8 GB/s) the same pipeline's transfer bound sits above 90,000x
realtime.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _subprocess_probe(timeout_s: float) -> bool:
    """True iff a FRESH python process can enumerate devices within
    ``timeout_s``.  Backend init serializes on one in-process lock, so
    once the parent's first attempt hangs, every in-process retry just
    queues behind it — only a separate process genuinely retries
    (round-4 advisor finding).  The child inherits the environment, so
    it probes the same backend the bench will use."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _await_backend(total_s: float = None):
    """Bounded, retrying backend init.  The relay-attached backend can be
    hard-down (observed 2026-08-17 AND at the round-4 bench, which lost
    its capture to a 900 s horizon: ``jax.devices()`` hangs for 15+ min,
    then UNAVAILABLE) — a bench run at round end must fail loud rather
    than stall the driver, but the horizon now spans most of a driver
    window (default 3300 s, env ``BENCH_INIT_BUDGET_S``) so a multi-
    minute relay stall no longer costs the round its only perf record.
    Returns the device list or exits 1 with a clear diagnostic (no JSON
    line: an outage is not a number).

    Shape of the wait: ONE in-process probe thread is launched (a hung
    ``jax.devices()`` holds the init lock, so relaunching in-process
    threads cannot help — they would only queue).  While it hangs, cheap
    subprocess probes track whether the relay has come back; when one
    succeeds, the parent's blocked init should complete moments later
    and the original thread's result is returned.  In-process *errors*
    release the lock, so those are retried in-process directly."""
    import threading

    import jax

    if total_s is None:
        total_s = float(os.environ.get("BENCH_INIT_BUDGET_S", "3300"))
    deadline = time.monotonic() + total_s
    attempt = 0
    box = {}
    lock = threading.Lock()

    def probe():
        try:
            devs = jax.devices()
            with lock:
                box["devs"] = devs
        except Exception as e:  # noqa: BLE001 — report any init failure
            with lock:
                box["err"] = e

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    while True:
        attempt += 1
        # half the remaining budget, capped: near the deadline the loop
        # polls quickly so a hung join can't swallow the whole horizon
        # before the deadline check (or the relay probes) ever run
        th.join(timeout=min(
            15.0, max(0.05, (deadline - time.monotonic()) / 2)))
        with lock:
            devs = box.get("devs")
            err = box.pop("err", None)
        if devs:
            return devs
        if time.monotonic() >= deadline:
            print(f"bench: backend unavailable after {total_s:.0f}s — "
                  "aborting without a JSON record (infra outage, not a "
                  "perf number)", file=sys.stderr)
            sys.exit(1)
        if err is not None:
            # errored init released the lock: in-process retry is real
            print(f"bench: backend init attempt {attempt} failed: {err}",
                  file=sys.stderr)
            time.sleep(min(30.0, max(0.0, deadline - time.monotonic())))
            th = threading.Thread(target=probe, daemon=True)
            th.start()
            continue
        # still hung: ask a fresh process whether the relay is back
        up = _subprocess_probe(
            timeout_s=min(120.0, max(5.0, deadline - time.monotonic())))
        print(f"bench: backend init attempt {attempt}: in-process init "
              f"hung; fresh-process probe says relay is "
              f"{'UP (awaiting parent init)' if up else 'down'}",
              file=sys.stderr)
        if not up:
            time.sleep(min(30.0, max(0.0, deadline - time.monotonic())))


def main() -> None:
    from strugatzki_tpu.dsp import frontend as FE

    import jax
    import jax.numpy as jnp
    print(f"bench devices: {_await_backend()}", file=sys.stderr)
    dev = jax.devices()[0]

    sr = 44100.0
    dur = 120.0
    reps = 8
    rng = np.random.default_rng(0)
    n = int(sr * dur)
    t = np.arange(n) / sr
    audio_f = (0.2 * rng.standard_normal(n)
               + 0.3 * np.sin(2 * np.pi * 220 * t)
               + 0.1 * np.sin(2 * np.pi * 1867 * t)).astype(np.float32)
    # PCM16 source material (the common case): ships as raw int16
    audio = np.clip(np.round(audio_f * 32768.0), -32768, 32767).astype(np.int16)
    audios = [audio] * reps

    # ---- link measurement: forced-roundtrip put of incompressible int16 ----
    # (block_until_ready does not actually await relay transfers here; a
    # dependent scalar fetch does — docs/BENCH_LINK.md)
    @jax.jit
    def _probe(x):
        return x[:4].astype(jnp.int32).sum()

    probe_payload = rng.integers(-32768, 32767, 8 << 20).astype(np.int16)
    int(_probe(jax.device_put(probe_payload, dev)))  # warm compile + path
    bw = []
    for _ in range(2):
        t0 = time.perf_counter()
        int(_probe(jax.device_put(probe_payload, dev)))
        bw.append(probe_payload.nbytes / (time.perf_counter() - t0) / 1e6)
    link = max(bw)
    ceiling = link * 1e6 / (2 * sr)
    print(f"link: {link:.1f} MB/s incompressible h2d -> wire-implied PCM16 "
          f"extraction ceiling ~{ceiling:.0f}x realtime", file=sys.stderr)

    # ---- warmup / compile (one batched program: all files, one dispatch) ---
    t0 = time.perf_counter()
    feats = FE.extract_features_batch(audios, sr, block_frames=8192)
    t1 = time.perf_counter()
    print(f"warmup (incl. compile): {t1 - t0:.2f}s, shape {feats.shape}",
          file=sys.stderr)

    # ---- end-to-end throughput: staged chunked uploads (≤24 MB pieces; the
    # relay collapses on larger single transfers), device-side assembly, one
    # scan dispatch, result fetch.  Compute is ~40 ms device-resident vs
    # seconds of wire, so wall ≈ wire.
    #
    # Drift-proof capture (round-3 policy — a single pre-run probe once
    # stopped the loop early on a stale rate and captured a regression):
    # every round is bracketed by its own 16 MiB incompressible probes,
    # its wire share is computed against the better of the two
    # (conservative: a faster probe makes saturation *harder* to claim),
    # and rounds continue until the best round is wire-saturated (≥95% of
    # its own bracketing rate) or the time budget expires — so a drifting
    # link gets as many chances as the budget allows to be caught healthy.
    # A blown budget stops the loop even before the 3-round minimum
    # (tunnel stalls can make one round take minutes; the driver's
    # wall-clock limit must always see the JSON line).
    payload_bytes = reps * audio.nbytes
    payload_mb = payload_bytes / 1e6
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "75"))
    rounds = []   # (elapsed_s, own_rate_MBps, wire_share)
    rate_pre = link
    t_loop = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        out = FE.extract_features_batch(audios, sr, block_frames=8192)
        el = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(_probe(jax.device_put(probe_payload, dev)))
        rate_post = probe_payload.nbytes / (time.perf_counter() - t0) / 1e6
        own_rate = max(rate_pre, rate_post)
        share = payload_bytes / (own_rate * 1e6) / el
        rounds.append((el, own_rate, share))
        print(f"  round {len(rounds)}: {el:.2f}s for {payload_mb:.0f} MB, "
              f"bracket {rate_pre:.1f}/{rate_post:.1f} MB/s -> wire share "
              f"{share * 100:.0f}%", file=sys.stderr)
        rate_pre = rate_post
        spent = time.perf_counter() - t_loop
        best = min(rounds)
        if spent > budget_s or (len(rounds) >= 3 and best[2] >= 0.95):
            break
    elapsed, best_rate, best_share = min(rounds)
    rt = dur * reps / elapsed
    print(f"extraction: best of {len(rounds)} rounds "
          f"{[round(e, 2) for e, _, _ in rounds]}s -> {rt:.0f}x realtime "
          f"(shape {out.shape}); best round's own-bracket wire share "
          f"{best_share * 100:.0f}% at {best_rate:.1f} MB/s",
          file=sys.stderr)

    # ---- device-resident compute throughput (input already on chip) --------
    try:
        step, fft = 512, 1024
        # the production staging layout, from the one shared helper
        x_dev, carry0, consts, block, nb = FE.stage_resident_batch(
            audios, sr, block_frames=8192)
        int(_probe(x_dev[0]))  # ensure resident

        @jax.jit
        def _probe_out(o):
            return o[:, -1, :, -4:].sum()

        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o, _ = FE._extract_scan_batch(
                x_dev, carry0, *consts, num_blocks=nb, block=block,
                fft_size=fft, step=step)
            float(_probe_out(o))
            ts.append(time.perf_counter() - t0)
        print(f"device-resident compute: best {min(ts) * 1e3:.1f} ms for "
              f"{reps * dur:.0f}s audio -> {reps * dur / min(ts):.0f}x "
              f"realtime (forced tail-probe)", file=sys.stderr)
    except Exception as e:  # diagnostics only
        print(f"resident-compute diagnostic skipped: {e}", file=sys.stderr)

    # ---- the contract line FIRST: the optional correlation diagnostic
    # below can compile for minutes through the relay, and a driver
    # timeout must never cost the metric
    print(json.dumps({
        "metric": "feature-extraction realtime multiple per chip",
        "value": round(rt, 1),
        "unit": "x realtime",
        "vs_baseline": round(rt / 1000.0, 3),
    }), flush=True)

    # ---- standing batched-kernel canary (after the JSON line: its small
    # compiles can't cost the metric).  Plants exact matches through the
    # production chunked query/punch batch kernels and asserts sim 1.0 —
    # the round-4 backend fault (silently deflated sims at power-of-two
    # >= 2048 fused trace lanes) would flip this line to FAIL in the
    # recorded stderr tail.  BENCH_CANARY=0 skips.
    if os.environ.get("BENCH_CANARY", "1") not in ("0", "false", "no",
                                                   "off"):
        try:
            from strugatzki_tpu.parallel.canary import (format_report,
                                                        run_batch_canary)
            t0 = time.perf_counter()
            report = run_batch_canary()
            print(f"{format_report(report)} "
                  f"[{time.perf_counter() - t0:.1f}s incl. compiles]",
                  file=sys.stderr)
            # compact (bf16 spectra + window-sum table) serving kernels:
            # the production 10k mode; also checks the raw sums-trace sims
            t0 = time.perf_counter()
            report = run_batch_canary(cache_spectra="bf16")
            print(f"compact {format_report(report)} "
                  f"[{time.perf_counter() - t0:.1f}s incl. compiles]",
                  file=sys.stderr)
        except Exception as e:  # diagnostics only; metric already printed
            print(f"batch-kernel canary ERRORED: {e}", file=sys.stderr)
    else:
        print("batch-kernel canary skipped (BENCH_CANARY=0)",
              file=sys.stderr)

    # ---- correlation sweep diagnostic (north star: 10s punch vs 10k-file
    # DB < 1s). Off by default: axon remote compiles don't hit the
    # persistent cache, and each extra program risks minutes of compile.
    # Measured on this chip (2026-08-16): 64 files ~46 ms, 512 files
    # ~62 ms incl. the ~28 ms relay RTT -> ~68 us/file device time ->
    # real 10k-file DB measured 0.78-0.85 s (tools/db10k_bench.py).
    if not os.environ.get("BENCH_CORRELATION"):
        print("correlation bench skipped (set BENCH_CORRELATION=1)",
              file=sys.stderr)
    else:
        try:
            from strugatzki_tpu.analysis.correlation import InputTemplate
            from strugatzki_tpu.parallel.database import FeatureDatabase

            n_files, file_frames, punch_frames = 512, 10336, 861
            entries = [(f"f{i}.aif",
                        np.abs(0.5 + 0.1 * rng.standard_normal((14, file_frames)))
                        .astype(np.float32)) for i in range(n_files)]
            tmpl = InputTemplate(entries[0][1][:, 100:100 + punch_frames].copy())
            t0 = time.perf_counter()
            db = FeatureDatabase(entries, norm=None, cache_spectra=True)
            t_load = time.perf_counter() - t0
            db.query(tmpl)  # compile
            t0 = time.perf_counter()
            res = db.query(tmpl)
            lat = time.perf_counter() - t0          # incl. host fetch RTT
            k = 10
            t0 = time.perf_counter()
            for _ in range(k):
                res = db.query(tmpl)
            amort = (time.perf_counter() - t0) / k
            windows = n_files * (file_frames - punch_frames + 1)
            # extrapolate from a base large enough that per-file device
            # time dominates the fixed dispatch overhead (64-file bases
            # overestimate 3-6x)
            rtt = 0.028  # measured dispatch+fetch round trip
            est10k = rtt + max(amort - rtt, 0.0) * 10000 / n_files
            print(f"correlation (resident DB): load {t_load:.2f}s; query "
                  f"latency {lat * 1000:.1f} ms, amortized {amort * 1000:.1f} ms "
                  f"/{n_files} files = {windows / amort / 1e6:.0f}M windows/s; "
                  f"10k-file est ≈ {est10k:.2f}s from this cached-spectra "
                  f"base (uncached 10k MEASURED 0.78-0.85s, "
                  f"tools/db10k_bench.py; north star < 1s); "
                  f"best @ {res.frames[0, 0]}", file=sys.stderr)
        except Exception as e:  # diagnostics only; metric already printed
            print(f"correlation bench skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
