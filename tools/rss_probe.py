"""Where does staging RSS go?  Phase-by-phase VmRSS/VmHWM of a 10k-scale
memmap staging run (no query compile — staging only).

    python tools/rss_probe.py [n_files]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss(tag):
    with open("/proc/self/status") as f:
        vals = {}
        for line in f:
            if line.startswith(("VmRSS", "VmHWM")):
                k, v = line.split(":")
                vals[k] = int(v.strip().split()[0]) / 2**20
    print(f"{tag:32s} RSS {vals['VmRSS']:.2f} GiB  peak {vals['VmHWM']:.2f}"
          " GiB", flush=True)


rss("start")
from strugatzki_tpu.parallel.database import FeatureDatabase  # noqa: E402
from strugatzki_tpu.parallel import database as D             # noqa: E402
import jax  # noqa: E402

jax.devices()
rss("jax + package imported")

args = [a for a in sys.argv[1:] if not a.startswith("--")]
n_files = int(args[0]) if args else 10000
file_frames = 10336


def synth(i):
    r = np.random.default_rng(1000 + i)
    base = r.uniform(0.3, 0.7, size=(14, 1)).astype(np.float32)
    return np.abs(base + 0.1 * r.standard_normal(
        (14, file_frames)).astype(np.float32))


memory_mode = "--memory" in sys.argv
if memory_mode:
    entries = [(f"f{i}.aif", synth(i)) for i in range(n_files)]
    rss("entries materialized (memory mode)")
else:
    entries = ((f"f{i}.aif", synth(i)) for i in range(n_files))

orig_put = D.staged_put
slab_n = [0]


def traced_put(arr, **kw):
    out = orig_put(arr, **kw)
    slab_n[0] += 1
    rss(f"after staged_put #{slab_n[0]} ({arr.nbytes/2**30:.2f} GiB)")
    if os.environ.get("RSS_TRIM"):
        import ctypes
        ctypes.CDLL("libc.so.6").malloc_trim(0)
        rss(f"  after malloc_trim #{slab_n[0]}")
    return out


D.staged_put = traced_put
fr = []


def prog(f):
    fr.append(f)


kw = {} if memory_mode else dict(raw_store="memmap",
                                 time_capacity=file_frames)
db = FeatureDatabase(entries, norm=None, cache_spectra="bf16",
                     progress=prog, **kw)
rss("staged (incl. spectra cache)")
print(f"resident {(db._xs.nbytes + sum(s.nbytes for s in db._spectra))/2**30:.2f} GiB device")
