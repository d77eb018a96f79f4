"""Stacked (weight-banked) MoE with true expert parallelism.

The heterogeneous expert pools (different kernel/patch sizes per expert,
models/components.py) are separate compile units — right for the flagship
4+4-expert config, but they cannot scale to the 64-expert stretch config
(BASELINE.md: "64 experts sharded across a v5e-16 slice with all-to-all
expert parallelism"). This module adds the TPU-native scalable form:

- expert weights are STACKED with a leading expert axis (``vmap`` over
  init), stored under the ``"stacked_experts"`` key that
  parallel/sharding.py maps to the ``expert`` mesh axis;
- dispatch gathers each expert's top-``capacity`` routed samples into an
  (E, C, ...) bank batch, runs ONE vmapped expert computation (a single
  XLA program whose leading axis GSPMD partitions across expert devices —
  the gather/scatter lower to all-to-all collectives over ICI);
- combine scatter-adds the gate-weighted outputs back to batch order.

Semantics match models/moe.py's capacity dispatch: with capacity >= B no
sample is dropped; smaller capacities trade exactness for FLOPs like any
capacity-based MoE.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def stacked_expert_init(key: jax.Array, num_experts: int, init_fn: Callable[[jax.Array], Any]):
    """Initialize E experts of identical architecture as one stacked pytree
    (every leaf gains a leading expert axis)."""
    keys = jax.random.split(key, num_experts)
    return jax.vmap(init_fn)(keys)


def expert_assignment(gate_weights: jnp.ndarray, capacity: int):
    """Build (E, C) dispatch indices + validity from a sparse gate (B, E).

    For every expert, routed samples (gate > 0) are ranked by batch position
    and the first ``capacity`` selected; unrouted slots point at sample 0
    with ``valid=False`` (their contribution is zeroed in combine).
    """
    b, e = gate_weights.shape
    sel = (gate_weights > 0).T  # (E, B)
    rank = jnp.where(sel, jnp.arange(b)[None, :], b)
    idx = jnp.argsort(rank, axis=1)[:, :capacity]  # (E, C)
    valid = jnp.take_along_axis(sel, idx, axis=1)  # (E, C)
    weights = jnp.take_along_axis(gate_weights.T, idx, axis=1)
    weights = jnp.where(valid, weights, 0.0)
    return idx, weights


def moe_dispatch_stacked(
    x: jnp.ndarray,
    stacked_params: Any,
    apply_fn: Callable[..., jnp.ndarray],
    gate_weights: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    *,
    capacity: int,
    train: bool = False,
    key: Optional[jax.Array] = None,
    use_pallas: bool = False,
    top_k: int = 1,
    movement: str = "gather",
) -> jnp.ndarray:
    """Gather -> one vmapped expert bank -> weighted scatter combine.

    ``apply_fn(params_e, x_c, time_c, text_c, train=..., key=...)`` is the
    single-expert forward; it is vmapped over the leading expert axis of
    ``stacked_params`` and the gathered (E, C, ...) batches.

    Token ``movement`` (identical numerics for fp32 and for top-1; at
    top_k>1 under bf16 the einsum combine accumulates all k contributions
    in ONE f32 matmul with a single output cast, while the gather path
    scatter-adds in x.dtype — a ulp-level divergence in einsum's favor,
    equal-or-better precision):
      "gather"  XLA gather/scatter-add (the default; all-to-all under
                expert sharding)
      "pallas"  the Pallas dispatch/combine kernels
                (ops/pallas/moe_kernels.py) — explicit DMA data movement
      "einsum"  one-hot MXU matmuls with the gate weight folded into the
                combine contraction (GShard-style; +9.6% on the b512
                flagship sampler for the per-expert path,
                artifacts/einsum_dispatch_ab_r4.json)
    ``use_pallas=True`` is the legacy spelling of ``movement="pallas"``.
    """
    b = x.shape[0]
    e = gate_weights.shape[1]
    if use_pallas:
        movement = "pallas"
    if text_emb is not None and text_emb.ndim == 3:
        text_emb = text_emb.mean(axis=1)

    idx, weights = expert_assignment(gate_weights.astype(jnp.float32), capacity)

    if movement == "pallas":
        from hdmoe_tpu.ops.pallas.moe_kernels import dispatch_rows

        xg = dispatch_rows(x, idx)
        tg = dispatch_rows(time_emb, idx)
        txg = dispatch_rows(text_emb, idx) if text_emb is not None else None
    elif movement == "einsum":
        from hdmoe_tpu.models.moe import _onehot_matmul

        disp = jax.nn.one_hot(idx.reshape(-1), b, dtype=x.dtype)  # (E*C, B)

        def _oh(t):
            return _onehot_matmul(disp, t).reshape(e, capacity, *t.shape[1:])

        xg = _oh(x)
        tg = _oh(time_emb)
        txg = _oh(text_emb) if text_emb is not None else None
    else:
        xg = x[idx]  # (E, C, H, W, Cin) — all-to-all under expert sharding
        tg = time_emb[idx]
        txg = text_emb[idx] if text_emb is not None else None

    if train and key is not None:
        expert_keys = jax.random.split(key, e)
    else:
        expert_keys = None

    def one_expert(params_e, x_c, t_c, tx_c, k_e):
        return apply_fn(params_e, x_c, t_c, tx_c, train=train, key=k_e)

    if expert_keys is not None:
        out_e = jax.vmap(one_expert)(stacked_params, xg, tg, txg, expert_keys)
    else:
        out_e = jax.vmap(lambda p, xc, tc, txc: one_expert(p, xc, tc, txc, None))(
            stacked_params, xg, tg, txg
        )

    if movement == "pallas":
        from hdmoe_tpu.ops.pallas.moe_kernels import combine_rows, combine_tables

        slots, w_tab = combine_tables(idx, weights, b, top_k)
        return combine_rows(out_e, slots, w_tab).astype(x.dtype)
    if movement == "einsum":
        from hdmoe_tpu.models.moe import _onehot_matmul

        # (B, E*C) combine matrix with the gate weights folded in: each
        # column holds one (expert, slot) contribution — <= top_k nonzeros
        # per row, so the contraction is an exact weighted select.
        comb = (jax.nn.one_hot(idx.reshape(-1), b, dtype=x.dtype)
                * weights.reshape(-1, 1).astype(x.dtype)).T  # (B, E*C)
        out_flat = out_e.reshape(e * capacity, *x.shape[1:])
        return _onehot_matmul(comb, out_flat).astype(x.dtype)
    w = weights.astype(x.dtype)[..., None, None, None]  # (E, C, 1, 1, 1)
    flat_idx = idx.reshape(-1)
    contrib = (out_e * w).reshape(e * capacity, *x.shape[1:])
    return jnp.zeros_like(x).at[flat_idx].add(contrib)
