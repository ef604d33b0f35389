"""Host↔chip link characterization (the experiments behind docs/BENCH_LINK.md).

Measures, with forced round-trips (``block_until_ready`` acks before the
relay actually moves bytes — a dependent scalar fetch does not):

1. h2d bandwidth vs transfer size (the relay's large-transfer cliff —
   the experiment behind the ≤24 MB staged-put policy),
2. content dependence (the relay compresses: constant vs random payloads),
3. resident extraction compute (forced tail probe) vs end-to-end.

(The one-off chunked-vs-concurrent-puts comparison lives in
docs/BENCH_LINK.md §3: concurrency never beat serial chunked puts on the
single-stream relay, so it is not part of the recurring tool.)

Run on the real chip: ``python tools/linkbench.py``.  Expect minutes; the
tunnel stalls randomly, so every row reports best-of-3.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from strugatzki_tpu.dsp import frontend as FE

    dev = jax.devices()[0]
    print(f"device: {dev}")

    @jax.jit
    def probe(x):
        return x.reshape(-1)[:4].astype(jnp.int32).sum()

    def put_forced(a):
        t0 = time.perf_counter()
        int(probe(jax.device_put(a, dev)))
        return time.perf_counter() - t0

    put_forced(np.ones(128, np.int16))  # warm the probe compile

    rng = np.random.default_rng(0)

    print("\n-- h2d bandwidth vs size (constant payload) --")
    for mb in (8, 16, 32, 48, 64, 96):
        a = np.ones(mb << 19, np.int16)
        put_forced(a)
        best = min(put_forced(a) for _ in range(3))
        print(f"  {mb:3d} MB: {best:6.3f}s  {a.nbytes / best / 1e6:6.1f} MB/s")

    print("\n-- content dependence (32 MB) --")
    for name, a in (("ones", np.ones(32 << 19, np.int16)),
                    ("random int16", rng.integers(-32768, 32767, 32 << 19)
                     .astype(np.int16))):
        put_forced(a)
        best = min(put_forced(a) for _ in range(3))
        print(f"  {name:14s}: {best:6.3f}s  {a.nbytes / best / 1e6:6.1f} MB/s")

    print("\n-- extraction: resident compute vs end-to-end (8x120s PCM16) --")
    sr, dur, reps = 44100.0, 120.0, 8
    n = int(sr * dur)
    audio = np.clip(np.round(0.25 * rng.standard_normal(n) * 32768),
                    -32768, 32767).astype(np.int16)
    step, fft = 512, 1024
    # production staging layout from the shared helper (frontend)
    x_dev, carry0, consts, block, nb = FE.stage_resident_batch(
        [audio] * reps, sr, block_frames=8192)
    int(probe(x_dev))

    def run_resident():
        t0 = time.perf_counter()
        o, _ = FE._extract_scan_batch(x_dev, carry0, *consts, num_blocks=nb,
                                      block=block, fft_size=fft, step=step)
        float(probe(o))
        return time.perf_counter() - t0

    run_resident()  # compile
    best = min(run_resident() for _ in range(3))
    print(f"  resident: {best * 1e3:6.1f} ms -> {dur * reps / best:.0f}x "
          f"realtime (incl. dispatch RTT)")

    audios = [audio] * reps
    FE.extract_features_batch(audios, sr, block_frames=8192)  # compile
    t0 = time.perf_counter()
    FE.extract_features_batch(audios, sr, block_frames=8192)
    el = time.perf_counter() - t0
    print(f"  end-to-end: {el:5.2f} s -> {dur * reps / el:.0f}x realtime "
          f"({reps * audio.nbytes / 1e6:.0f} MB up)")


if __name__ == "__main__":
    main()
