"""A/B the TPU backend's FFT cost at power-of-two vs mixed-radix lengths
(the compact trace pays 2 irffts of _fft_len(Tp)=16384 per file while the
correlation only needs N >= Tp ~ 10368; 12288 = 3*2^12 would cut ~25% of
FFT work and spectra cache IF the backend handles radix 3 natively rather
than via Bluestein).

    python tools/fft_radix_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print(f"devices: {jax.devices()}", file=sys.stderr)
B = 2048
rng = np.random.default_rng(0)


def bench(n, reps=4):
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

    @jax.jit
    def f(x):
        # rfft + two irffts + a reduce, shaped like the trace's
        # template-dot path (complex created ON device — a host
        # complex64 upload is UNIMPLEMENTED through this relay)
        z = jnp.fft.rfft(x, n=n, axis=1)
        a = jnp.fft.irfft(z, n=n, axis=1)
        b = jnp.fft.irfft(z * (0.5 + 0.25j), n=n, axis=1)
        return (a + b).sum(axis=1)

    t0 = time.perf_counter()
    r = np.asarray(f(x))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    xn = np.asarray(x)
    zn = np.fft.rfft(xn, n=n, axis=1)
    want = (np.fft.irfft(zn, n=n, axis=1)
            + np.fft.irfft(zn * (0.5 + 0.25j), n=n, axis=1)).sum(axis=1)
    err = float(np.max(np.abs(r - want)))
    print(f"N={n:6d} ({'pow2' if n & (n-1) == 0 else 'mixed'}): "
          f"compile {compile_s:.1f}s, best {min(ts)*1e3:.1f} ms "
          f"over [B={B}] rfft+2 irfft, max|err|={err:.2e}", flush=True)


for n in (16384, 12288, 11264, 10368):
    try:
        bench(n)
    except Exception as e:
        print(f"N={n:6d}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}", flush=True)
