"""GPipe-style pipeline parallelism over a mesh axis.

No reference analog (single-device reference). Partitions a stack of S
HOMOGENEOUS stages (e.g. the ViT experts' identical DiffiT blocks, stacked
with a leading stage axis) across S devices on a mesh axis:

- stage parameters shard over the axis (each device holds one stage);
- the batch splits into M microbatches;
- the schedule runs M + S - 1 ticks: at tick t, device s processes
  microbatch t - s (when in range) and ppermutes its activations to device
  s+1 — the classic GPipe fill/steady/drain diagram, with neighbor-only
  ICI traffic.

TRAINING-CAPABLE: the tick loop is a ``lax.scan``, so reverse-mode AD
through ``gpipe`` is exactly the GPipe backward schedule — ticks replay in
reverse, each device re-enters its stage VJP for the microbatch it processed
at that tick, cotangents ppermute one hop LEFT (the transpose of the forward
rotation), and the per-tick activations are the scan residuals (the
"activation stash"). No hand-written backward pass to maintain; grads are
exact vs the sequential composition (tests/test_pipeline.py).
"""

from __future__ import annotations

from contextlib import contextmanager
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_PP_CTX: list = []  # trace-time stack of (mesh, axis, num_microbatches)


@contextmanager
def pipeline_context(mesh: Mesh, axis: str = "model", num_microbatches: int = 4):
    """Declare the mesh axis for pipelined ViT expert blocks
    (HDMOEMConfig.pipeline_vit_blocks) — trace-time state like
    parallel.ep.ep_context."""
    _PP_CTX.append((mesh, axis, num_microbatches))
    try:
        yield
    finally:
        _PP_CTX.pop()


def current_pipeline_context():
    return _PP_CTX[-1] if _PP_CTX else None


def _pipeline_local(stage_params, x_micro, aux_micro, *, stage_fn, axis_name: str, num_stages: int, num_micro: int, has_aux: bool, varying_axes: tuple = ()):
    """Per-device pipeline body (inside shard_map).

    stage_params: this device's stage (leading stage axis stripped to 1).
    x_micro: (M_local...) only device 0's shard carries real inputs after
      sharding constraints; we instead replicate inputs and let device 0 feed.
    """
    s = lax.axis_index(axis_name)
    stage_params = jax.tree_util.tree_map(lambda l: l[0], stage_params)
    m, *rest = x_micro.shape
    buf = jnp.zeros(rest, dtype=x_micro.dtype)  # activation arriving from the left
    outs = jnp.zeros_like(x_micro)
    # carries become device-varying inside the loop (ppermute/stage compute);
    # mark the initial values as varying over the pipeline axis too — and
    # over the batch axis when the microbatches are data-sharded (the
    # injected x is varying there, so the where() mixing them must agree)
    buf = jax.lax.pcast(buf, (axis_name,) + varying_axes, to="varying")
    # outs derives from x_micro and is already varying over the batch axis
    outs = jax.lax.pcast(outs, (axis_name,), to="varying")

    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
    ticks = num_micro + num_stages - 1

    def body(carry, t):
        buf, outs = carry
        # device 0 ingests microbatch t from the input; others use the buffer
        feed_idx = jnp.clip(t, 0, num_micro - 1)
        inject = lax.dynamic_index_in_dim(x_micro, feed_idx, axis=0, keepdims=False)
        x_in = jnp.where(s == 0, inject, buf)

        my_micro = t - s  # which microbatch this device works on this tick
        active = jnp.logical_and(my_micro >= 0, my_micro < num_micro)
        if has_aux:
            # per-microbatch side input (e.g. the time embedding): replicated
            # across stages, indexed locally by the microbatch this device is
            # processing — no extra communication.
            aux_in = lax.dynamic_index_in_dim(
                aux_micro, jnp.clip(my_micro, 0, num_micro - 1), axis=0, keepdims=False
            )
            y = stage_fn(stage_params, x_in, aux_in)
        else:
            y = stage_fn(stage_params, x_in)
        y = jnp.where(active, y, buf)

        # last stage writes its finished microbatch
        out_idx = jnp.clip(my_micro, 0, num_micro - 1)
        write = jnp.logical_and(active, s == num_stages - 1)
        cur = lax.dynamic_index_in_dim(outs, out_idx, axis=0, keepdims=False)
        outs = lax.dynamic_update_index_in_dim(
            outs, jnp.where(write, y, cur), out_idx, axis=0
        )
        # rotate activations one stage to the right
        buf = lax.ppermute(y, axis_name, perm)
        return (buf, outs), None

    # scan (not fori_loop): reverse-mode AD through the scan IS the GPipe
    # backward schedule, with the per-tick activations as residuals.
    (_, outs), _ = lax.scan(body, (buf, outs), jnp.arange(ticks))
    # only the last device holds real outputs; zero elsewhere and psum to
    # replicate them across the pipeline axis
    outs = jnp.where(s == num_stages - 1, outs, 0.0)
    return lax.psum(outs, axis_name)


def gpipe(
    stage_fn: Callable[..., jnp.ndarray],
    stacked_stage_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    num_microbatches: int = 4,
    aux: Optional[jnp.ndarray] = None,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run ``x`` through S pipelined stages sharded over ``mesh[axis]``.

    ``stage_fn(params_s, x) -> y`` with y.shape == x.shape (homogeneous
    stages); ``stacked_stage_params`` leaves have leading dim S. The batch
    must divide by ``num_microbatches``. With ``aux`` (a batch-leading side
    input, e.g. a conditioning embedding), the stage signature becomes
    ``stage_fn(params_s, x, aux_microbatch)`` — aux is microbatched in
    lockstep with ``x`` and indexed locally on every stage.

    ``batch_axis`` composes PP with DP: the per-microbatch batch dim is
    sharded over that mesh axis, so every data row pipelines only its own
    batch shard (the schedule uses only ``axis``-collectives, so rows are
    independent). Without it x is replicated over the whole mesh — on a
    (data>1, pipe) mesh every data row would redundantly compute ALL
    microbatches.
    """
    s = mesh.shape[axis]
    lead = jax.tree_util.tree_leaves(stacked_stage_params)[0].shape[0]
    assert lead == s, f"stage count {lead} != mesh axis size {s}"
    b = x.shape[0]
    assert b % num_microbatches == 0
    micro_b = b // num_microbatches
    if batch_axis is not None:
        assert batch_axis in mesh.axis_names and batch_axis != axis
        assert micro_b % mesh.shape[batch_axis] == 0, (
            f"microbatch size {micro_b} must divide over mesh['{batch_axis}']"
            f"={mesh.shape[batch_axis]}")
    x_micro = x.reshape(num_microbatches, micro_b, *x.shape[1:])
    has_aux = aux is not None
    aux_micro = (
        aux.reshape(num_microbatches, micro_b, *aux.shape[1:])
        if has_aux
        else jnp.zeros((num_microbatches, 1), x.dtype)
    )

    data_spec = P(None, batch_axis) if batch_axis is not None else P()
    param_specs = jax.tree_util.tree_map(lambda l: P(axis, *([None] * (l.ndim - 1))), stacked_stage_params)
    fn = shard_map(
        partial(
            _pipeline_local,
            stage_fn=stage_fn,
            axis_name=axis,
            num_stages=s,
            num_micro=num_microbatches,
            has_aux=has_aux,
            varying_axes=(batch_axis,) if batch_axis is not None else (),
        ),
        mesh=mesh,
        # x/aux: batch-sharded over batch_axis (or replicated); pipe-stage 0
        # of every data row feeds its own shard
        in_specs=(param_specs, data_spec, data_spec if has_aux else P()),
        out_specs=data_spec,
    )
    outs = fn(stacked_stage_params, x_micro, aux_micro)
    return outs.reshape(b, *x.shape[1:])
