"""Multi-host support (parallel/multihost.py + data.py shard contract).

The reference has no distributed layer at all (single-process torch,
/root/reference/Utils/training.py); the oracle is internal consistency:
process-local slices must reassemble to exactly the single-process stream,
and a REAL 2-process jax.distributed run (CPU coordinator on localhost)
must train with the same global semantics as one process.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from hdmoe_tpu.parallel.mesh import MeshConfig, make_mesh
from hdmoe_tpu.parallel.multihost import (
    host_local_to_global,
    initialize,
    process_local_batch,
)
from hdmoe_tpu.train.data import SyntheticDataset, batch_iterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_initialize_noop_single_process(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    pid, nproc = initialize()
    assert (pid, nproc) == (0, 1)


def test_process_local_batch_math():
    mesh = make_mesh(MeshConfig(data=8))
    assert process_local_batch(32, mesh) == 32  # single process: full batch


def test_host_local_to_global_single_process_is_device_put():
    mesh = make_mesh(MeshConfig(data=8))
    batch = np.arange(8 * 4 * 4 * 3, dtype=np.uint8).reshape(8, 4, 4, 3)
    arr = host_local_to_global(batch, mesh)
    assert arr.shape == batch.shape
    np.testing.assert_array_equal(np.asarray(arr), batch)
    # sharded over the data axis: each device holds one row
    assert len(arr.sharding.device_set) == 8
    # microbatch stacks shard axis 1
    stack = np.stack([batch, batch])
    arr5 = host_local_to_global(stack, mesh, batch_axis=1)
    assert arr5.shape == stack.shape
    np.testing.assert_array_equal(np.asarray(arr5), stack)


def test_batch_iterator_shard_slices_reassemble():
    """Concatenating every process's sharded stream (in process order) must
    reproduce the unsharded stream exactly — the contract
    make_array_from_process_local_data relies on."""
    ds = SyntheticDataset(resolution=8, size=32)
    full = batch_iterator(ds, 8, seed=3, start_batch=2)
    parts = [batch_iterator(ds, 8, seed=3, start_batch=2, shard=(p, 4)) for p in range(4)]
    for _ in range(6):
        want = next(full)
        got = np.concatenate([next(p) for p in parts], axis=0)
        np.testing.assert_array_equal(got, want)


def test_batch_iterator_shard_validates_divisibility():
    ds = SyntheticDataset(resolution=8, size=32)
    with pytest.raises(ValueError):
        next(batch_iterator(ds, 6, shard=(0, 4)))


_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["HDMOE_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]

from hdmoe_tpu.parallel.multihost import initialize, host_local_to_global
got = initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
                 process_id=pid)
assert got == (pid, nproc), got
assert jax.device_count() == nproc * 4, jax.device_count()

import numpy as np
from hdmoe_tpu.parallel.mesh import MeshConfig, make_mesh
from hdmoe_tpu.train.data import SyntheticDataset, batch_iterator

mesh = make_mesh(MeshConfig(data=nproc * 4))
ds = SyntheticDataset(resolution=8, size=64)
local = next(batch_iterator(ds, 16, seed=5, shard=(pid, nproc)))
arr = host_local_to_global(local.astype(np.float32), mesh)
assert arr.shape == (16, 8, 8, 3), arr.shape

# a jitted SPMD reduction over the global array must see ALL rows: compare
# against the unsharded stream's mean computed on the host
mean = jax.jit(lambda x: x.mean())(arr)
want = next(batch_iterator(ds, 16, seed=5)).astype(np.float32).mean()
np.testing.assert_allclose(float(mean), float(want), rtol=1e-6)
print(f"proc {pid} ok {float(mean):.6f}")
"""


@pytest.mark.skipif(os.environ.get("HDMOE_SKIP_SUBPROCESS") == "1",
                    reason="subprocess tests disabled")
def test_two_process_distributed_cpu(tmp_path):
    """REAL jax.distributed: 2 processes x 4 CPU devices, one 8-device global
    mesh; the globally-assembled batch reduces to the unsharded oracle."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {**os.environ,
           "HDMOE_REPO": REPO,
           "JAX_PLATFORM_NAME": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(p), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for p in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out, out
