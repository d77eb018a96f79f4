"""Pallas MoE dispatch/combine kernels.

The token-movement half of expert routing as explicit TPU kernels
(BASELINE.json north star: "top-k gating ... lowers to Pallas
dispatch/combine kernels"):

- ``pallas_dispatch``: gather each expert's routed samples into the dense
  (E, C, F) bank batch. The dispatch table is a scalar-prefetch operand
  (pltpu.PrefetchScalarGridSpec) so each grid step can issue all of its
  HBM->VMEM row DMAs up front and overlap them (8 rows in flight per step —
  the Mosaic sublane granule).

- ``pallas_combine``: the inverse, restructured to be race-free: instead of
  scatter-ADDING expert outputs (collisions when top-k > 1), each output
  sample GATHERS its k contributions via a precomputed (B, k) slot table and
  reduces them with its gate weights in VMEM. No atomics, fully parallel
  over samples.

``combine_tables`` builds the (B, k) inverse tables from the (E, C) dispatch
assignment with plain jnp ops. Both kernels run in interpret mode off-TPU
and compile on TPU (row blocks padded to the (8, 128) tile granule).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # sublane granule: rows gathered per grid step


def _pad_rows(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % mult
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _pad_cols(x: jnp.ndarray) -> jnp.ndarray:
    pad = (-x.shape[-1]) % 128
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))


# ---------------------------------------------------------------------------
# Dispatch: x (B, F), idx (E, C) -> (E, C, F)
# ---------------------------------------------------------------------------


def _sublane(dtype) -> int:
    """Packing granule of the second-minor axis: 8/itemsize-scaled — (8,128)
    tiles for f32, (16,128) for bf16 (2 values per sublane), etc."""
    return max(1, 4 // jnp.dtype(dtype).itemsize) if jnp.dtype(dtype).itemsize < 4 else 1


def _dispatch_kernel(idx_ref, x_hbm, out_ref, sems, *, sub):
    # x_hbm: (B, sub, F); out block: (_ROWS, sub, F) — the near-singleton
    # axis makes every row its own (sub, F) tile unit, which is what Mosaic
    # requires for single-row HBM DMA (row slices of an (8,128)-tiled 2D
    # array are not DMA-addressable). ``sub`` is the packing granule of the
    # dtype (1 for f32, 2 for bf16): slices along the second-minor axis must
    # align to it.
    p = pl.program_id(0)
    copies = []
    for j in range(_ROWS):
        i = idx_ref[p * _ROWS + j]
        dma = pltpu.make_async_copy(x_hbm.at[i], out_ref.at[j], sems.at[j])
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()


def pallas_dispatch(x: jnp.ndarray, idx: jnp.ndarray, *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """Gather rows of ``x`` (B, F) into (E, C, F) per the dispatch table."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e, c = idx.shape
    b, f = x.shape
    xp = _pad_cols(x)
    fp = xp.shape[-1]
    sub = _sublane(x.dtype)
    flat_idx = _pad_rows(idx.reshape(-1, 1).astype(jnp.int32), _ROWS).reshape(-1)
    n = flat_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // _ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_ROWS, sub, fp), lambda p, idx_ref: (p, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_ROWS,))],
    )
    src = jnp.broadcast_to(xp[:, None, :], (b, sub, fp)) if sub > 1 else xp[:, None, :]
    out = pl.pallas_call(
        functools.partial(_dispatch_kernel, sub=sub),
        out_shape=jax.ShapeDtypeStruct((n, sub, fp), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(flat_idx, src)
    return out[: e * c, 0, :f].reshape(e, c, f)


# ---------------------------------------------------------------------------
# Combine: contributions (E*C, F), slot table (B, k), weights (B, k) -> (B, F)
# ---------------------------------------------------------------------------


def combine_tables(idx: jnp.ndarray, weights: jnp.ndarray, batch: int, top_k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Invert the (E, C) dispatch assignment into per-sample gather tables.

    Returns ``slots (B, k)`` — flattened (e*C + c) positions holding sample
    b's contributions (slot 0 with weight 0 when the sample has fewer than k
    live contributions) — and ``w (B, k)`` gate weights.
    """
    e, c = idx.shape
    flat_sample = idx.reshape(-1)  # sample served at each slot
    flat_w = weights.reshape(-1)
    live = flat_w != 0.0
    # order slots so each sample's live slots come first, then take k per sample
    order = jnp.argsort(jnp.where(live, flat_sample, batch), stable=True)
    sorted_samples = jnp.where(live, flat_sample, batch)[order]
    # position of each slot within its sample's run
    first_occurrence = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sorted_samples[1:] != sorted_samples[:-1]).astype(jnp.int32)]
    )
    run_start = jnp.maximum.accumulate(jnp.where(first_occurrence == 1, jnp.arange(e * c), 0))
    rank_in_sample = jnp.arange(e * c) - run_start
    valid = (sorted_samples < batch) & (rank_in_sample < top_k)
    slots = jnp.zeros((batch, top_k), dtype=jnp.int32)
    w = jnp.zeros((batch, top_k), dtype=weights.dtype)
    # invalid entries scatter OUT OF BOUNDS (row == batch) so mode="drop"
    # discards them — routing them to any in-bounds cell would clobber a
    # real sample's slot (they race on the same index).
    rows = jnp.where(valid, sorted_samples, batch)
    cols = jnp.where(valid, rank_in_sample, 0)
    slots = slots.at[rows, cols].set(order.astype(jnp.int32), mode="drop")
    w = w.at[rows, cols].set(flat_w[order], mode="drop")
    return slots, w


# ---------------------------------------------------------------------------
# Differentiable ND wrappers — the model-facing surface (models/moe.py,
# models/moe_stacked.py call these when dispatch="pallas"). Forward = Pallas
# kernel (data movement as explicit DMA); backward = the jnp adjoint
# (scatter-add / gather), which XLA compiles well.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def dispatch_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather sample rows ``x (B, ...)`` into expert banks ``(E, C, ...)``
    via the Pallas dispatch kernel. Differentiable in ``x``."""
    e, c = idx.shape
    flat = pallas_dispatch(x.reshape(x.shape[0], -1), idx)
    return flat.reshape(e, c, *x.shape[1:])


def _dispatch_rows_fwd(x, idx):
    # dtype rides in a zero-size proto array (np.dtype objects are not valid
    # residual leaves); the shape tuple is static at trace time.
    return dispatch_rows(x, idx), (x.shape, jnp.zeros((0,), x.dtype), idx)


def _dispatch_rows_bwd(res, g):
    shape, proto, idx = res
    f = int(np.prod(shape[1:]))
    dx = (
        jnp.zeros((shape[0], f), proto.dtype)
        .at[idx.reshape(-1)]
        .add(g.reshape(-1, f).astype(proto.dtype))
        .reshape(shape)
    )
    return dx, np.zeros(idx.shape, dtype=jax.dtypes.float0)


dispatch_rows.defvjp(_dispatch_rows_fwd, _dispatch_rows_bwd)


@jax.custom_vjp
def combine_rows(contrib: jnp.ndarray, slots: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted combine of expert outputs ``contrib (E, C, ...)`` back to
    batch order ``(B, ...)`` via the gather-based Pallas combine kernel.
    ``slots/weights (B, k)`` from :func:`combine_tables`. Differentiable in
    ``contrib`` and ``weights`` (gate gradients flow)."""
    e, c = contrib.shape[:2]
    feat = contrib.shape[2:]
    out = pallas_combine(contrib.reshape(e * c, -1), slots, weights)
    return out.reshape(slots.shape[0], *feat).astype(contrib.dtype)


def _combine_rows_fwd(contrib, slots, weights):
    return combine_rows(contrib, slots, weights), (contrib, slots, weights)


def _combine_rows_bwd(res, g):
    contrib, slots, weights = res
    e, c = contrib.shape[:2]
    f = int(np.prod(contrib.shape[2:]))
    gf = g.reshape(g.shape[0], f)
    # d contrib[slot[b,j]] += w[b,j] * g[b]
    dcontrib = (
        jnp.zeros((e * c, f), contrib.dtype)
        .at[slots.reshape(-1)]
        .add((weights[..., None].astype(g.dtype) * gf[:, None, :]).reshape(-1, f).astype(contrib.dtype))
        .reshape(contrib.shape)
    )
    # d w[b,j] = <contrib[slot[b,j]], g[b]>
    cf = contrib.reshape(e * c, f)
    dw = jnp.einsum("bkf,bf->bk", cf[slots].astype(jnp.float32), gf.astype(jnp.float32)).astype(weights.dtype)
    return dcontrib, np.zeros(slots.shape, dtype=jax.dtypes.float0), dw


combine_rows.defvjp(_combine_rows_fwd, _combine_rows_bwd)


def _combine_kernel(slots_ref, w_ref, contrib_hbm, out_ref, scratch, sems, *, top_k, sub):
    # contrib_hbm: (N, sub, F); scratch: (_ROWS*k, sub, F); out: (_ROWS, sub, F)
    p = pl.program_id(0)
    copies = []
    for j in range(_ROWS):
        for t in range(top_k):
            slot = slots_ref[(p * _ROWS + j) * top_k + t]
            dma = pltpu.make_async_copy(contrib_hbm.at[slot], scratch.at[j * top_k + t], sems.at[j * top_k + t])
            dma.start()
            copies.append(dma)
    for dma in copies:
        dma.wait()
    for j in range(_ROWS):
        acc = jnp.zeros((sub, scratch.shape[-1]), dtype=jnp.float32)
        for t in range(top_k):
            w = w_ref[(p * _ROWS + j) * top_k + t]
            acc = acc + scratch[j * top_k + t].astype(jnp.float32) * w
        out_ref[j] = acc.astype(out_ref.dtype)


def pallas_combine(
    contributions: jnp.ndarray,
    slots: jnp.ndarray,
    weights: jnp.ndarray,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """out[b] = sum_j weights[b, j] * contributions[slots[b, j]].

    contributions: (E*C, F); slots/weights: (B, k). Gather-based — no
    scatter collisions regardless of top-k.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k = slots.shape
    n, f = contributions.shape
    cp = _pad_cols(contributions)
    fp = cp.shape[-1]
    sub = _sublane(contributions.dtype)
    slots_p = _pad_rows(slots.astype(jnp.int32), _ROWS)
    w_p = _pad_rows(weights.astype(jnp.float32), _ROWS)
    bp = slots_p.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bp // _ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_ROWS, sub, fp), lambda p, slots_ref, w_ref: (p, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_ROWS * k, sub, fp), contributions.dtype),
            pltpu.SemaphoreType.DMA((_ROWS * k,)),
        ],
    )
    kernel = functools.partial(_combine_kernel, top_k=k, sub=sub)
    src = jnp.broadcast_to(cp[:, None, :], (cp.shape[0], sub, fp)) if sub > 1 else cp[:, None, :]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bp, sub, fp), contributions.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(slots_p.reshape(-1), w_p.reshape(-1), src)
    return out[:b, 0, :f]
