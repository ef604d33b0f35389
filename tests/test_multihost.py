"""Multi-host (multi-process) smoke test: two local processes join a
``jax.distributed`` group over localhost, build the global ``files`` mesh
(parallel/multihost.py) and answer a sharded correlation query SPMD — the
DCN-across-hosts scaling path of SURVEY §2.3, exercised with virtual CPU
devices (4 per process → an 8-device global mesh)."""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import sys
import numpy as np

repo, coord, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, repo)

import jax
jax.config.update("jax_platforms", "cpu")

from strugatzki_tpu.parallel.multihost import initialize, global_files_mesh

initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())      # global
assert len(jax.local_devices()) == 4                     # per host

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.parallel.sweep import pad_stack, sharded_sweep_step

mesh = global_files_mesh()
assert mesh.devices.size == 8

# every process builds the SAME 8-file dataset deterministically and
# contributes the rows living on its local devices
rng = np.random.default_rng(0)
C, T, L = 14, 96, 24
files = [np.abs(0.5 + 0.1 * rng.standard_normal((C, T))).astype(np.float32)
         for _ in range(8)]
tmpl = InputTemplate(files[3][:, 11:11 + L].copy())

prepared, shifts = [], []
for f in files:
    xs, sh_t, _ = K.shift_per_group(f)
    prepared.append(xs)
    shifts.append(sh_t)
xs_b, lens = pad_stack(prepared)

shard = NamedSharding(mesh, P("files"))
from jax import make_array_from_process_local_data
# rows 0-3 live on process 0's devices, 4-7 on process 1's
lo = pid * 4
xs_g = make_array_from_process_local_data(shard, xs_b[lo:lo + 4])
sh_g = make_array_from_process_local_data(
    shard, np.asarray(shifts, np.float32)[lo:lo + 4])
lens_g = make_array_from_process_local_data(shard, lens[lo:lo + 4])

step = sharded_sweep_step(mesh)
vals, idx = step(xs_g, jnp.asarray(tmpl.temporal_centered),
                 jnp.asarray(tmpl.spectral_centered),
                 jnp.float32(tmpl.temporal_std),
                 jnp.float32(tmpl.spectral_std),
                 jnp.float32(tmpl.ln_avg_loudness),
                 sh_g, lens_g, jnp.float32(0.5), jnp.float32(8.0))

from jax.experimental import multihost_utils
vals_all = np.asarray(multihost_utils.process_allgather(vals, tiled=True))
idx_all = np.asarray(multihost_utils.process_allgather(idx, tiled=True))
vals_all = vals_all.reshape(8, -1)
idx_all = idx_all.reshape(8, -1)
# file 3 (on process 0's shard) contains its own template
assert idx_all[3, 0] == 11, idx_all[3]
assert abs(vals_all[3, 0] - 1.0) < 1e-3, vals_all[3]
print("proc %d ok: global mesh 8, hit @ %d" % (pid, idx_all[3, 0]))
"""


def test_two_process_sharded_query():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               STRUGATZKI_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _CHILD, repo, coord, str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("jax.distributed stalled in this sandbox")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        if rc != 0 and "distributed" in err and "support" in err.lower():
            pytest.skip(f"jax.distributed unsupported here: {err[-300:]}")
        assert rc == 0, err[-3000:]
        assert "ok: global mesh 8" in out, (out, err[-1000:])
