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


def _free_port() -> str:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return f"127.0.0.1:{s.getsockname()[1]}"


def _env(n_devices: int) -> dict:
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               STRUGATZKI_PLATFORM="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count"
                         f"={n_devices}")
    env.pop("JAX_NUM_PROCESSES", None)
    return env


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _communicate(procs, timeout=420):
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("jax.distributed stalled in this sandbox")
        outs.append((p.returncode, out, err))
    return outs


def _assert_ok(outs, marker):
    for rc, out, err in outs:
        if rc != 0 and "distributed" in err and "support" in err.lower():
            pytest.skip(f"jax.distributed unsupported here: {err[-300:]}")
        assert rc == 0, err[-3000:]
        assert marker in out, (out, err[-1000:])


def test_two_process_sharded_query():
    coord = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-c", _CHILD, _REPO, coord, str(i)],
        env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    _assert_ok(_communicate(procs), "ok: global mesh 8")


_CHILD_UNEVEN = r"""
import sys
import numpy as np

repo, coord, pid, ndev = sys.argv[1], sys.argv[2], int(sys.argv[3]), \
    int(sys.argv[4])
sys.path.insert(0, repo)

import jax
jax.config.update("jax_platforms", "cpu")

from strugatzki_tpu.parallel.multihost import initialize, global_files_mesh

initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert len(jax.local_devices()) == ndev, len(jax.local_devices())
assert len(jax.devices()) == 6, len(jax.devices())       # 4 + 2 global

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from strugatzki_tpu.analysis.correlation import InputTemplate
from strugatzki_tpu.kernels import corr as K
from strugatzki_tpu.parallel.sweep import pad_stack, sharded_sweep_step

mesh = global_files_mesh()
assert mesh.devices.size == 6

# 12 files over 6 devices -> 2 rows per device; process 0 (4 devices)
# owns rows 0-7, process 1 (2 devices) rows 8-11 — UNEVEN host shares.
rng = np.random.default_rng(0)
C, T, L = 14, 96, 24
files = [np.abs(0.5 + 0.1 * rng.standard_normal((C, T))).astype(np.float32)
         for _ in range(12)]
tmpl = InputTemplate(files[9][:, 17:17 + L].copy())   # on process 1's share

prepared, shifts = [], []
for f in files:
    xs, sh_t, _ = K.shift_per_group(f)
    prepared.append(xs)
    shifts.append(sh_t)
xs_b, lens = pad_stack(prepared)

shard = NamedSharding(mesh, P("files"))
from jax import make_array_from_process_local_data
lo, hi = (0, 8) if pid == 0 else (8, 12)
# uneven host shares: the global shape can't be inferred, pass it
xs_g = make_array_from_process_local_data(shard, xs_b[lo:hi], xs_b.shape)
sh_np = np.asarray(shifts, np.float32)
sh_g = make_array_from_process_local_data(shard, sh_np[lo:hi], sh_np.shape)
lens_g = make_array_from_process_local_data(shard, lens[lo:hi], lens.shape)

step = sharded_sweep_step(mesh)
vals, idx = step(xs_g, jnp.asarray(tmpl.temporal_centered),
                 jnp.asarray(tmpl.spectral_centered),
                 jnp.float32(tmpl.temporal_std),
                 jnp.float32(tmpl.spectral_std),
                 jnp.float32(tmpl.ln_avg_loudness),
                 sh_g, lens_g, jnp.float32(0.5), jnp.float32(8.0))

from jax.experimental import multihost_utils
vals_all = np.asarray(multihost_utils.process_allgather(
    vals, tiled=True)).reshape(12, -1)
idx_all = np.asarray(multihost_utils.process_allgather(
    idx, tiled=True)).reshape(12, -1)
assert idx_all[9, 0] == 17, idx_all[9]
assert abs(vals_all[9, 0] - 1.0) < 1e-3, vals_all[9]
print("proc %d ok: uneven mesh 6, hit @ %d" % (pid, idx_all[9, 0]))
"""


def test_uneven_process_device_counts():
    """4 + 2 virtual devices per process → a 6-device global mesh with
    uneven host shares of the files axis; the planted hit lives on the
    smaller host's shard."""
    coord = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-c", _CHILD_UNEVEN, _REPO, coord, str(i),
         str(n)],
        env=_env(n), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i, n in ((0, 4), (1, 2))]
    _assert_ok(_communicate(procs), "ok: uneven mesh 6")


_CHILD_MISSING = r"""
import sys
repo, coord = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")
from strugatzki_tpu.parallel.multihost import initialize
try:
    initialize(coordinator_address=coord, num_processes=2, process_id=0,
               initialization_timeout=15)
except Exception as e:
    print("clean failure:", type(e).__name__, str(e)[:200])
    sys.exit(3)
print("unexpectedly initialized")
"""


def test_missing_worker_fails_cleanly():
    """A worker that never arrives (killed before joining) must surface
    as a BOUNDED failure on the waiting process — not a hang.  The
    coordinator (process 0) waits for process 1, which never starts;
    ``initialization_timeout`` bounds the wait.  Two acceptable shapes,
    both pinned: a catchable Python exception (exit 3 from the child's
    handler), or JAX's distributed client hard-aborting the process with
    DEADLINE_EXCEEDED (observed on this jax version: client.h terminates
    on the RegisterTask deadline before the exception can propagate).
    Either way the process exits non-zero within the timeout."""
    coord = _free_port()
    p = subprocess.Popen(
        [sys.executable, "-c", _CHILD_MISSING, _REPO, coord],
        env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    try:
        out, err = p.communicate(timeout=180)
    except subprocess.TimeoutExpired:
        p.kill()
        pytest.fail("initialize() hung past initialization_timeout with "
                    "a missing worker — no clean failure surface")
    if p.returncode == 0:
        pytest.fail(f"initialize() unexpectedly succeeded: {out!r}")
    if p.returncode != 3 and "support" in err.lower() \
            and "DEADLINE" not in err:
        pytest.skip(f"jax.distributed unsupported here: {err[-300:]}")
    catchable = p.returncode == 3 and "clean failure:" in out
    hard_abort = "DEADLINE_EXCEEDED" in err or "Deadline Exceeded" in err
    assert catchable or hard_abort, (p.returncode, out, err[-2000:])


def test_save_on_one_topology_load_on_another(tmp_path):
    """A database saved under one mesh topology must load and answer
    identically under a different one (8 shards → 4 shards → single
    device): the archive is topology-free, staging re-pads the files
    axis per mesh, and only the padded tail may differ."""
    import jax
    import numpy as np

    from strugatzki_tpu.analysis.correlation import InputTemplate
    from strugatzki_tpu.parallel.database import FeatureDatabase
    from strugatzki_tpu.parallel.sweep import make_files_mesh

    rng = np.random.default_rng(5)
    ents = [(f"t{i}.aif",
             np.abs(0.5 + 0.2 * rng.standard_normal((5, 150 + 7 * i)))
             .astype(np.float32)) for i in range(10)]
    mesh8 = make_files_mesh()
    db8 = FeatureDatabase(ents, norm=None, pad_multiple=32, mesh=mesh8)
    path = tmp_path / "db.strug.npz"
    db8.save(path)

    mesh4 = make_files_mesh(jax.devices()[:4])
    loads = [FeatureDatabase.load(path, mesh=mesh4),
             FeatureDatabase.load(path)]
    tmpl = InputTemplate(ents[7][1][:, 40:100].copy())
    ref = db8.query(tmpl, k=3)
    n = len(ents)
    for db in loads:
        assert db.files[:n] == db8.files[:n]
        np.testing.assert_array_equal(db._lens[:n], db8._lens[:n])
        np.testing.assert_array_equal(db._raw[:n], db8._raw[:n])
        res = db.query(tmpl, k=3)
        # different topologies are different compiled programs: plan budget
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(res.sims)[:n], neginf=0),
            np.nan_to_num(np.asarray(ref.sims)[:n], neginf=0), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(res.frames)[:n],
                                      np.asarray(ref.frames)[:n])
        assert float(np.asarray(res.sims)[7, 0]) == pytest.approx(
            1.0, abs=1e-5)
