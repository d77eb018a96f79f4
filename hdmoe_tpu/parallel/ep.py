"""Explicit all-to-all expert parallelism (shard_map).

Round-2 finding (tests/test_ep_collectives.py): under plain GSPMD sharding
the stacked-bank dispatch (models/moe_stacked.py) does NOT lower to
all-to-all — XLA all-gathers the expert weight banks to every device and
computes all experts everywhere, which defeats EP at the 64-expert stretch
scale (BASELINE.md). This module implements the token-exchange pattern
explicitly, the way large MoE systems run it over ICI:

- the batch shards over BOTH the ``data`` and ``expert`` mesh axes (each
  device owns B/(data*expert) tokens); expert banks shard over ``expert``;
- each source shard picks its top-``capacity/n`` tokens per expert (local
  first-come-first-served capacity — the standard per-shard capacity
  semantics of sharded MoE);
- ONE ``lax.all_to_all`` ships each expert's token groups to the device
  owning that expert (ICI neighbor traffic);
- the vmapped expert bank runs on (E_local, n*C_local) bank batches;
- the INVERSE all_to_all returns outputs to their source shards, where the
  gate-weighted combine is a purely local scatter-add. No weight gathering,
  no batch broadcast; collectives are exactly two all-to-alls.

Integration: ``HDMOEMConfig(expert_sharing="stacked", ep_axis="expert")``
routes moe_dispatch_stacked through :func:`all_to_all_moe_dispatch` inside
an :func:`ep_context`. The reference has no distributed analog (SURVEY.md
§2.7); this replaces its serial per-expert loop (model_config1.py:11-39) at
scale.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_EP_CTX: list = []  # trace-time stack of (mesh, data_axis, expert_axis)


@contextmanager
def ep_context(mesh: Mesh, data_axis: str = "data", expert_axis: str = "expert"):
    """Declare the mesh for all-to-all EP dispatch (trace-time state, like
    ops.attention.ring_attention_context)."""
    _EP_CTX.append((mesh, data_axis, expert_axis))
    try:
        yield
    finally:
        _EP_CTX.pop()


def current_ep_context():
    return _EP_CTX[-1] if _EP_CTX else None


def _local_dispatch(
    x, stacked_params, gate, time_emb, text_emb, key,
    *, apply_fn, expert_axis: str, n_exp: int, cap_local: int, train: bool,
):
    """Per-device body: local select -> all_to_all -> expert bank -> inverse
    all_to_all -> local combine. Shapes per device:

    x (B_loc, ...feat), gate (B_loc, E_global), params (E_loc, ...),
    E_global = n_exp * E_loc.
    """
    from hdmoe_tpu.models.moe_stacked import expert_assignment

    b_loc = x.shape[0]
    e_global = gate.shape[1]
    e_loc = e_global // n_exp
    feat = x.shape[1:]

    # 1. local per-expert selection (first C_loc local tokens per expert)
    idx, weights = expert_assignment(gate.astype(jnp.float32), cap_local)  # (E_g, C_loc)

    xg = x[idx]  # (E_g, C_loc, ...) — local gather
    tg = time_emb[idx]
    txg = text_emb[idx] if text_emb is not None else None

    # 2. ship token groups to their expert's device: split the leading
    #    E_global axis into n_exp groups of E_loc and exchange
    def a2a(t):
        g = t.reshape(n_exp, e_loc, *t.shape[1:])
        g = lax.all_to_all(g, expert_axis, split_axis=0, concat_axis=0, tiled=False)
        # (n_exp, E_loc, C_loc, ...) — leading axis now indexes SOURCE shard
        return jnp.moveaxis(g, 0, 1).reshape(e_loc, n_exp * g.shape[2], *g.shape[3:])

    xb = a2a(xg)  # (E_loc, n*C_loc, ...)
    tb = a2a(tg)
    txb = a2a(txg) if txg is not None else None

    # 3. run the local expert bank
    if train and key is not None:
        keys = jax.random.split(jax.random.fold_in(key, lax.axis_index(expert_axis)), e_loc)
    else:
        keys = None

    def one_expert(p, xc, tc, txc, k):
        return apply_fn(p, xc, tc, txc, train=train, key=k)

    if keys is not None:
        out_b = jax.vmap(one_expert)(stacked_params, xb, tb, txb, keys)
    else:
        out_b = jax.vmap(lambda p, xc, tc, txc: one_expert(p, xc, tc, txc, None))(
            stacked_params, xb, tb, txb
        )

    # 4. inverse exchange: outputs back to source shards
    def a2a_inv(t):
        g = t.reshape(t.shape[0], n_exp, t.shape[1] // n_exp, *t.shape[2:])
        g = jnp.moveaxis(g, 1, 0)  # (n_exp, E_loc, C_loc, ...)
        g = lax.all_to_all(g, expert_axis, split_axis=0, concat_axis=0, tiled=False)
        return g.reshape(n_exp * t.shape[0], t.shape[1] // n_exp, *t.shape[2:])

    out_g = a2a_inv(out_b)  # (E_g, C_loc, ...)

    # 5. local weighted combine
    w = weights.astype(x.dtype).reshape(e_global, cap_local, *([1] * len(feat)))
    contrib = (out_g * w).reshape(e_global * cap_local, *feat)
    return jnp.zeros_like(x).at[idx.reshape(-1)].add(contrib)


def all_to_all_moe_dispatch(
    x: jnp.ndarray,
    stacked_params: Any,
    apply_fn: Callable[..., jnp.ndarray],
    gate_weights: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    mesh: Mesh,
    *,
    capacity: int,
    data_axis: str = "data",
    expert_axis: str = "expert",
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Global-array wrapper: shard tokens over (data, expert), banks over
    expert, run :func:`_local_dispatch`. ``capacity`` is the GLOBAL per-
    expert capacity; each of the ``n = data*expert`` token shards selects up
    to ``ceil(capacity / n_tok_shards)`` of its own tokens per expert."""
    n_exp = mesh.shape[expert_axis]
    n_tok = mesh.shape[data_axis] * n_exp
    b = x.shape[0]
    assert b % n_tok == 0, f"batch {b} must divide the {n_tok} token shards"
    assert gate_weights.shape[1] % n_exp == 0, "num_experts must divide the expert axis"
    cap_local = max(1, -(-capacity // n_tok))

    if text_emb is not None and text_emb.ndim == 3:
        text_emb = text_emb.mean(axis=1)

    def batch_spec(nd):
        return P((data_axis, expert_axis), *([None] * (nd - 1)))

    param_specs = jax.tree_util.tree_map(
        lambda l: P(expert_axis, *([None] * (l.ndim - 1))), stacked_params
    )
    has_text = text_emb is not None
    use_key = train and key is not None

    def body(x_, p_, g_, t_, tx_, k_):
        return _local_dispatch(
            x_, p_, g_, t_, tx_ if has_text else None, k_ if use_key else None,
            apply_fn=apply_fn, expert_axis=expert_axis, n_exp=n_exp,
            cap_local=cap_local, train=train,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            batch_spec(x.ndim),
            param_specs,
            batch_spec(2),
            batch_spec(time_emb.ndim),
            batch_spec(2) if has_text else P(),
            P(None),
        ),
        out_specs=batch_spec(x.ndim),
    )
    return fn(
        x, stacked_params, gate_weights, time_emb,
        text_emb if has_text else jnp.zeros((b, 1), x.dtype),
        key if key is not None else jnp.zeros((2,), jnp.uint32),
    )