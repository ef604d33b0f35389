"""Benchmark: feature-extraction throughput (realtime multiple per chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.json): >= 1000x realtime extraction per chip;
``vs_baseline`` is value / 1000.  Extra diagnostics go to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    from strugatzki_tpu.dsp.frontend import extract_features

    import jax
    print(f"bench devices: {jax.devices()}", file=sys.stderr)

    sr = 44100.0
    dur = 120.0
    rng = np.random.default_rng(0)
    n = int(sr * dur)
    t = np.arange(n) / sr
    audio_f = (0.2 * rng.standard_normal(n)
               + 0.3 * np.sin(2 * np.pi * 220 * t)
               + 0.1 * np.sin(2 * np.pi * 1867 * t)).astype(np.float32)
    # PCM16 source material (the common case): ships as raw int16
    audio = np.clip(np.round(audio_f * 32768.0), -32768, 32767).astype(np.int16)

    from strugatzki_tpu.dsp.frontend import finalize_features

    block = 8192
    # warmup / compile
    t0 = time.perf_counter()
    feats = extract_features(audio, sr, block_frames=block)
    t1 = time.perf_counter()
    print(f"warmup (incl. compile): {t1 - t0:.2f}s, shape {feats.shape}",
          file=sys.stderr)

    # pipelined batch throughput: async-dispatch all files, then drain —
    # uploads overlap compute exactly like the batch-extraction pipeline
    reps = 8
    t0 = time.perf_counter()
    handles = [extract_features(audio, sr, block_frames=block,
                                as_device=True) for _ in range(reps)]
    outs = [finalize_features(f, n) for f, n in handles]
    elapsed = time.perf_counter() - t0
    rt = dur * reps / elapsed
    print(f"extraction: {reps}x{dur:.0f}s audio in {elapsed:.3f}s "
          f"-> {rt:.0f}x realtime (shape {outs[0].shape})", file=sys.stderr)

    print(json.dumps({
        "metric": "feature-extraction realtime multiple per chip",
        "value": round(rt, 1),
        "unit": "x realtime",
        "vs_baseline": round(rt / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
