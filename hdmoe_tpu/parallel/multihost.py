"""Multi-host (multi-process) training support.

The reference is strictly single-process, single-GPU
(/root/reference/Utils/training.py:114-197 — no distributed layer at all).
This module carries the framework onto multi-host TPU pods the JAX way:

- ``initialize()`` wires ``jax.distributed`` from explicit args or the
  standard environment (on Cloud TPU pods the coordinator/process topology
  auto-resolves from the TPU metadata; elsewhere pass
  ``coordinator_address``/``num_processes``/``process_id``).
- The mesh stays GLOBAL: after initialization ``jax.devices()`` lists every
  chip in the pod, so ``parallel.mesh.make_mesh`` and every sharding rule in
  ``parallel.sharding`` work unchanged — one SPMD program, XLA collectives
  over ICI within a host-block and DCN across.
- Host-fed data becomes *process-local*: each process loads/generates only
  its slice of the global batch and ``host_local_to_global`` assembles the
  single jax.Array the (unchanged) train step consumes, via
  ``jax.make_array_from_process_local_data`` — no host ever materializes the
  full global batch. ``dataset="synthetic-device"`` needs no feeding at all
  and is the preferred pod-scale path (sharding.make_sharded_train_devicegen).

Single-process remains the no-op fast path throughout: ``initialize()``
without args or env is a no-op, and ``host_local_to_global`` on a
process_count==1 mesh is exactly ``jax.device_put(batch, batch_sharding)``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from hdmoe_tpu.parallel.sharding import batch_sharding

# Environment variables honored by initialize(); same names the JAX
# ecosystem's launchers export.
_ENV_COORD = "JAX_COORDINATOR_ADDRESS"
_ENV_NPROC = "JAX_NUM_PROCESSES"
_ENV_PID = "JAX_PROCESS_ID"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[str] = None,
) -> tuple[int, int]:
    """Initialize ``jax.distributed`` and return (process_index, process_count).

    Resolution order per field: explicit arg, then environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), then —
    if nothing is set anywhere — a single-process no-op. On Cloud TPU pods
    where the runtime self-describes, calling with only
    ``coordinator_address=None`` but JAX_NUM_PROCESSES set still delegates
    the unset fields to jax.distributed's auto-detection.

    Idempotent: a second call (or a call after manual
    ``jax.distributed.initialize``) just returns the current topology.
    """
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])

    from jax._src import distributed as _dist  # no public is-initialized probe

    already = getattr(_dist.global_state, "client", None) is not None
    if not already and (coordinator_address or num_processes or process_id is not None):
        kwargs = {}
        if coordinator_address:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        if local_device_ids is not None:
            kwargs["local_device_ids"] = [int(x) for x in str(local_device_ids).split(",")]
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def process_local_batch(global_batch: int, mesh: Mesh) -> int:
    """This process's share of the global batch.

    The data axis splits the batch over devices; devices split over
    processes; a process therefore feeds
    ``global_batch * (local devices on the data axis / data axis size)``.
    Requires the global batch to divide evenly (same constraint GSPMD
    imposes on the sharded dimension).
    """
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} must be divisible by the process count {n_proc}"
        )
    return global_batch // n_proc


def host_local_to_global(local_batch: np.ndarray, mesh: Mesh, batch_axis: int = 0):
    """Assemble the global batch array from each process's local slice.

    ``local_batch`` is this process's rows (process order = process_index
    order along the data axis). Returns one global jax.Array sharded
    ``P("data", ...)`` that the unchanged sharded train step consumes.
    Single-process this is exactly ``device_put(batch, batch_sharding)``.
    """
    sharding = batch_sharding(mesh, np.ndim(local_batch), axis=batch_axis)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = list(np.shape(local_batch))
    global_shape[batch_axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch), tuple(global_shape)
    )
