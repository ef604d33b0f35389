"""A/B: does host-side int16 delta coding raise end-to-end upload
throughput through the content-compressing relay?  (VERDICT r3 item 7.)

The relay compresses traffic content-dependently (docs/BENCH_LINK.md:
~60-110 MB/s for patterned bytes vs ~22-40 MB/s for noise-like PCM16).
Delta coding maps tonal material to small residuals — byte streams with
most upper bytes zero — which generic compressors squeeze well; the device
inverts losslessly with one int32 cumsum truncated back to int16 (modular
arithmetic, bit-exact).

Measures, with forced round-trips, for three PCM16 payloads (pure noise /
the bench's noise+sines mix / strongly tonal):
  raw upload MB/s  vs  delta-coded upload MB/s (+ the cumsum decode cost)
and prints the effective end-to-end speedup per material.  Adoption rule
(VERDICT): wire the transform into the extraction path only if an honest
A/B shows >= 15% on music-like material; otherwise record the negative
result in docs/BENCH_LINK.md and close the question.

    python tools/delta_ab.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def payloads(n):
    rng = np.random.default_rng(0)
    t = np.arange(n) / 44100.0
    noise = (0.5 * rng.standard_normal(n)).astype(np.float32)
    mix = (0.2 * rng.standard_normal(n)
           + 0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.1 * np.sin(2 * np.pi * 1867 * t)).astype(np.float32)
    tonal = (0.4 * np.sin(2 * np.pi * 220 * t)
             + 0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.15 * np.sin(2 * np.pi * 883 * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)

    def pcm(x):
        return np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)

    return [("noise", pcm(noise)), ("mix", pcm(mix)), ("tonal", pcm(tonal))]


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = 16 << 20                      # 32 MiB of int16 per payload

    @jax.jit
    def probe(x):
        return x[:4].astype(jnp.int32).sum()

    @jax.jit
    def decode_probe(d):
        # modular inverse of int16 delta coding; the probe forces the
        # decode AND the transfer (block_until_ready lies on this relay)
        x = jnp.cumsum(d.astype(jnp.int32)).astype(jnp.int16)
        return x[:4].astype(jnp.int32).sum(), x[-4:].astype(jnp.int32).sum()

    # correctness first: bit-exact roundtrip on device
    rng = np.random.default_rng(1)
    chk = rng.integers(-32768, 32767, 1 << 16).astype(np.int16)
    d = np.diff(chk, prepend=np.int16(0))      # wraps mod 2^16
    back = np.asarray(jnp.cumsum(jnp.asarray(d, jnp.int32)
                                 ).astype(jnp.int16))
    assert np.array_equal(back, chk), "delta roundtrip not exact"
    print("delta roundtrip: bit-exact", file=sys.stderr)

    for name, pcm in payloads(n):
        delta = np.diff(pcm, prepend=np.int16(0))
        # warm both programs/paths
        int(probe(jax.device_put(pcm[: 1 << 20], dev)))
        decode_probe(jax.device_put(delta[: 1 << 20], dev))[0].block_until_ready()
        raw_rates, dec_rates = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(probe(jax.device_put(pcm, dev)))
            raw_rates.append(pcm.nbytes / (time.perf_counter() - t0) / 1e6)
            t0 = time.perf_counter()
            a, b = decode_probe(jax.device_put(delta, dev))
            int(a); int(b)
            dec_rates.append(pcm.nbytes / (time.perf_counter() - t0) / 1e6)
        r, dcd = max(raw_rates), max(dec_rates)
        print(f"{name:6s}: raw {r:7.1f} MB/s "
              f"{[round(x, 1) for x in raw_rates]}  |  delta+decode "
              f"{dcd:7.1f} MB/s {[round(x, 1) for x in dec_rates]}  |  "
              f"speedup x{dcd / r:.2f}")


if __name__ == "__main__":
    main()
