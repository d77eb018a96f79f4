"""Static-shape Mixture-of-Experts dispatch/combine, TPU-native.

The reference dispatches with a data-dependent Python loop over boolean
sub-batches (model_config1.py:11-39 ``router_to_unet_experts``): gather the
samples routed to expert i, run the expert on the ragged sub-batch,
scatter-add the weighted outputs. Data-dependent shapes cannot compile to a
single XLA graph, so this module replaces that loop with two static-shape
strategies:

- ``dense`` (exact): every expert runs the full batch; outputs are combined
  with the sparse gate weights. A sample whose gate weight for expert i is
  zero contributes ``0 * expert_i(x)`` — numerically identical to the
  reference's skip, including zero gradient flow into masked experts.

- ``capacity``: classic fixed-capacity dispatch. For each expert, the first
  ``capacity`` routed samples (in batch order) are gathered into a dense
  (capacity, ...) sub-batch via one gather, processed, and combined back with
  a weighted scatter. With ``capacity = B`` no sample is ever dropped (the
  reference never drops), smaller capacities trade exactness for FLOPs.

Experts are heterogeneous (different kernel/patch sizes), so they are separate
compile units rather than a weight-stacked vmap; dispatch therefore operates
at whole-sample granularity, matching the reference's per-sample routing.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def reroute_overflow(
    gate_weights: jnp.ndarray,
    gate_probs: jnp.ndarray,
    capacity,
) -> jnp.ndarray:
    """Confidence-prioritized capacity selection + overflow-to-next-choice.

    The round-2 serving-dial measurement (PERF.md) showed the whole quality
    cost of capacity dispatch comes from DROPS: during EDM sampling every
    image in the batch shares one sigma, the noise-conditioned routers are
    correlated, per-step expert load is spiky, and first-come-first-served
    selection (``expert_assignment``) drops whichever routed tokens happen to
    sit late in the batch — those samples get NO expert at that step (top-1)
    and fall back to the bare skip path (FID 1.43 -> 2.55 at cf=1.0). The
    reference never drops (model_config1.py:26-38 runs ragged sub-batches);
    this pre-pass recovers most of that guarantee at fixed shapes:

    1. per expert, routed tokens are ranked by ROUTER CONFIDENCE
       (``gate_probs``) instead of batch position; the top-``capacity`` keep
       their slot;
    2. overflow tokens move their gate weight to their next-choice expert
       (highest prob among experts they are not already routed to, and that
       prob must be > 0 — specialization-masked experts have exactly-zero
       probs and can never receive rerouted tokens);
    3. rerouted tokens compete (by confidence) for that expert's LEFTOVER
       capacity; tokens that still do not fit are dropped as before.

    Returns a new sparse (B, E) gate matrix in which every expert has at most
    ``capacity`` nonzeros, so any downstream capacity-``capacity`` dispatch
    (moe_dispatch_capacity / expert_assignment / grouped / pallas) keeps
    every surviving token. Total per-token weight is preserved for kept and
    rerouted tokens. Wired behind ``HDMOEMConfig.capacity_policy="priority"``.

    ``capacity`` may be a scalar or a per-expert (E,) vector — the round-5
    load-profiled heterogeneous-capacity dial (capacity_profile in configs):
    experts are separate compile units, so each can be provisioned for its
    own measured share of the mixed-sigma routing load instead of the
    uniform cf*B/E (artifacts/router_telemetry_r5.json measured the steady-
    state shares at [0.32, 0.00, 0.16, 0.52] — uniform capacity either
    drops heavily at cf=1 or doubles FLOPs at cf=2).
    """
    b, e = gate_weights.shape
    capacity = jnp.asarray(capacity)  # scalar or (E,); broadcasts below
    probs = gate_probs.astype(jnp.float32)
    w = gate_weights.astype(jnp.float32)
    routed = w > 0

    # 1. keep the `capacity` most-confident routed tokens per expert
    prio = jnp.where(routed, probs, -jnp.inf)
    order = jnp.argsort(-prio, axis=0)  # per-expert tokens, confidence desc
    rank = jnp.argsort(order, axis=0)  # rank of token i within expert e
    keep = routed & (rank < capacity)
    kept_w = jnp.where(keep, w, 0.0)

    # 2. overflow weight moves to the token's best untried expert
    moved_w = jnp.where(routed & ~keep, w, 0.0).sum(axis=1)  # (B,)
    cand_prio = jnp.where(routed, -jnp.inf, probs)
    cand_prio = jnp.where(cand_prio > 0.0, cand_prio, -jnp.inf)  # mask prob-0
    next_e = jnp.argmax(cand_prio, axis=1)  # (B,)
    next_ok = (moved_w > 0) & jnp.isfinite(cand_prio[jnp.arange(b), next_e])

    # 3. rerouted tokens compete for leftover capacity, by confidence
    cand = jnp.full((b, e), -jnp.inf, dtype=jnp.float32)
    cand = cand.at[jnp.arange(b), next_e].set(
        jnp.where(next_ok, probs[jnp.arange(b), next_e], -jnp.inf)
    )
    crank = jnp.argsort(jnp.argsort(-cand, axis=0), axis=0)
    leftover = jnp.maximum(capacity - keep.sum(axis=0), 0)  # (E,)
    accept = jnp.isfinite(cand) & (crank < leftover[None, :])
    new_w = kept_w + jnp.where(accept, moved_w[:, None], 0.0)
    return new_w.astype(gate_weights.dtype)


def moe_dispatch_dense(
    x: jnp.ndarray,
    expert_fns: Sequence[Callable[..., jnp.ndarray]],
    gate_weights: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Run every expert on the full batch; combine with sparse gate weights.

    ``expert_fns[i](x, time_emb, text_emb, train=..., key=...)`` must return a
    tensor shaped like ``x``. 3-D text embeddings are mean-pooled over the
    sequence axis first, matching model_config1.py:18-22.
    """
    if text_emb is not None and text_emb.ndim == 3:
        text_emb = text_emb.mean(axis=1)
    keys = jax.random.split(key, len(expert_fns)) if (train and key is not None) else [None] * len(expert_fns)
    out = jnp.zeros_like(x)
    for i, fn in enumerate(expert_fns):
        w = gate_weights[:, i].astype(x.dtype)
        out = out + fn(x, time_emb, text_emb, train=train, key=keys[i]) * w[:, None, None, None]
    return out


def moe_dispatch_capacity(
    x: jnp.ndarray,
    expert_fns: Sequence[Callable[..., jnp.ndarray]],
    gate_weights: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    *,
    capacity: int,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Fixed-capacity gather -> expert -> weighted scatter dispatch.

    For each expert i, samples with nonzero gate weight are ranked by batch
    position; the first ``capacity`` are gathered (padded with sample 0 and a
    zero weight when fewer are routed) and processed as one dense sub-batch.
    Output positions are scattered back additively. With ``capacity >= B``
    this is exact; below that, overflow samples are dropped for that expert
    (standard MoE capacity semantics).
    """
    b = x.shape[0]
    caps = _per_expert_caps(capacity, len(expert_fns))
    if text_emb is not None and text_emb.ndim == 3:
        text_emb = text_emb.mean(axis=1)
    keys = jax.random.split(key, len(expert_fns)) if (train and key is not None) else [None] * len(expert_fns)
    out = jnp.zeros_like(x)
    for i, fn in enumerate(expert_fns):
        w = gate_weights[:, i]
        selected = w > 0
        # Rank routed samples by batch order; unrouted samples sort to the end.
        order = jnp.argsort(jnp.where(selected, jnp.arange(b), b))
        idx = order[:caps[i]]
        valid = selected[idx]
        xi = x[idx]
        ti = time_emb[idx]
        txi = text_emb[idx] if text_emb is not None else None
        oi = fn(xi, ti, txi, train=train, key=keys[i])
        wi = jnp.where(valid, w[idx], 0.0).astype(x.dtype)
        out = out.at[idx].add(oi * wi[:, None, None, None])
    return out


def _per_expert_caps(capacity, n_experts: int):
    """Normalize a scalar-or-sequence capacity to one static int per expert.

    Heterogeneous experts are separate compile units, so per-expert STATIC
    sub-batch sizes are free — the load-profiled capacity dial rides this."""
    if isinstance(capacity, (list, tuple)):
        assert len(capacity) == n_experts, (len(capacity), n_experts)
        return tuple(int(c) for c in capacity)
    return (int(capacity),) * n_experts


def _onehot_matmul(m: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """``m @ t`` over t's leading axis, preserving t's trailing shape/dtype.

    ``m`` rows are one-hot (or weighted one-hot with <=1 nonzero), so the
    contraction is an exact row-select/scale. fp32 operands pin
    ``precision=HIGHEST`` so the TPU bf16x-pass decomposition cannot perturb
    parity-grade paths; bf16 operands are exact under any precision (each
    output element is one product against 1.0 summed with zeros)."""
    prec = (jax.lax.Precision.HIGHEST
            if t.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    flat = t.reshape(t.shape[0], -1)
    out = jax.lax.dot(m.astype(t.dtype), flat, precision=prec,
                      preferred_element_type=jnp.float32)
    return out.astype(t.dtype).reshape((m.shape[0],) + t.shape[1:])


def moe_dispatch_capacity_einsum(
    x: jnp.ndarray,
    expert_fns: Sequence[Callable[..., jnp.ndarray]],
    gate_weights: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    *,
    capacity: int,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Capacity dispatch with one-hot MATMUL gather/combine (GShard-style).

    Same selection semantics as :func:`moe_dispatch_capacity` (FCFS by batch
    position; compose with ``reroute_overflow`` upstream for the priority
    policy), but token movement rides the MXU instead of gather/scatter
    units: the b512 sampler profile (artifacts/profile_r3_b512_t) shows the
    gather at 320 GB/s and the combine scatter-add at 146 GB/s — 18-40% of
    HBM peak — plus a separate 331 MB/eval broadcast ``mul`` for the gate
    weights. Here dispatch is ``onehot(idx) @ x`` and combine is
    ``(onehotᵀ·w) @ expert_out`` — the gate-weight multiply FOLDS into the
    combine matmul and both movements run as dense MXU contractions, the
    lowering GShard/Switch chose for TPU for exactly this reason (GShard,
    Lepikhin et al. 2020, §3.2 einsum dispatch masks).

    Numerics: dispatch is an exact row-select (see :func:`_onehot_matmul`);
    combine rows carry at most one nonzero per expert, so the only rounding
    is the ``w*out`` product itself — the same grade as the reference
    scatter path's broadcast multiply.
    """
    b = x.shape[0]
    caps = _per_expert_caps(capacity, len(expert_fns))
    if text_emb is not None and text_emb.ndim == 3:
        text_emb = text_emb.mean(axis=1)
    keys = jax.random.split(key, len(expert_fns)) if (train and key is not None) else [None] * len(expert_fns)
    out = jnp.zeros_like(x)
    for i, fn in enumerate(expert_fns):
        w = gate_weights[:, i]
        selected = w > 0
        order = jnp.argsort(jnp.where(selected, jnp.arange(b), b))
        idx = order[:caps[i]]
        valid = selected[idx]
        disp = jax.nn.one_hot(idx, b, dtype=x.dtype)  # (capacity, B)
        xi = _onehot_matmul(disp, x)
        ti = _onehot_matmul(disp, time_emb)
        txi = _onehot_matmul(disp, text_emb) if text_emb is not None else None
        oi = fn(xi, ti, txi, train=train, key=keys[i])
        wi = jnp.where(valid, w[idx], 0.0).astype(x.dtype)
        comb = disp.T * wi[None, :]  # (B, capacity), gate weight folded in
        out = out + _onehot_matmul(comb, oi)
    return out


def moe_dispatch_capacity_pallas(
    x: jnp.ndarray,
    expert_fns: Sequence[Callable[..., jnp.ndarray]],
    gate_weights: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    *,
    capacity: int,
    top_k: int = 1,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Capacity dispatch with Pallas kernel-backed token movement.

    Same semantics as :func:`moe_dispatch_capacity` (same first-come-
    first-served assignment, same overflow drops) but the gathers collapse
    into ONE ``dispatch_rows`` kernel call per operand for all experts, and
    the weighted scatter becomes the race-free gather-based ``combine_rows``
    kernel (each output row pulls its <= top_k contributions; no scatter
    collisions at any top_k). Backward is the jnp adjoint (custom_vjp), so
    masked experts keep exactly-zero gradients.
    """
    from hdmoe_tpu.models.moe_stacked import expert_assignment
    from hdmoe_tpu.ops.pallas.moe_kernels import combine_rows, combine_tables, dispatch_rows

    b = x.shape[0]
    if text_emb is not None and text_emb.ndim == 3:
        text_emb = text_emb.mean(axis=1)
    idx, weights = expert_assignment(gate_weights.astype(jnp.float32), capacity)  # (E, C)

    xg = dispatch_rows(x, idx)
    tg = dispatch_rows(time_emb, idx)
    txg = dispatch_rows(text_emb, idx) if text_emb is not None else None

    keys = jax.random.split(key, len(expert_fns)) if (train and key is not None) else [None] * len(expert_fns)
    outs = [
        fn(xg[i], tg[i], txg[i] if txg is not None else None, train=train, key=keys[i])
        for i, fn in enumerate(expert_fns)
    ]
    contrib = jnp.stack(outs)  # (E, C, ...)
    slots, w = combine_tables(idx, weights, b, top_k)
    return combine_rows(contrib, slots, w).astype(x.dtype)


def moe_dispatch(
    x: jnp.ndarray,
    expert_fns: Sequence[Callable[..., jnp.ndarray]],
    gate_weights: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    *,
    mode: str = "dense",
    capacity: Optional[int] = None,
    top_k: int = 1,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    if mode == "dense":
        return moe_dispatch_dense(x, expert_fns, gate_weights, time_emb, text_emb, train=train, key=key)
    if mode == "capacity":
        cap = capacity if capacity is not None else x.shape[0]
        return moe_dispatch_capacity(
            x, expert_fns, gate_weights, time_emb, text_emb, capacity=cap, train=train, key=key
        )
    if mode == "einsum":
        cap = capacity if capacity is not None else x.shape[0]
        return moe_dispatch_capacity_einsum(
            x, expert_fns, gate_weights, time_emb, text_emb, capacity=cap, train=train, key=key
        )
    if mode == "pallas":
        cap = capacity if capacity is not None else x.shape[0]
        if isinstance(cap, (list, tuple)):
            raise ValueError(
                "dispatch='pallas' packs experts into one stacked kernel call "
                "and needs a uniform capacity; use 'capacity' or 'einsum' "
                "with capacity_profile_*")
        return moe_dispatch_capacity_pallas(
            x, expert_fns, gate_weights, time_emb, text_emb,
            capacity=cap, top_k=top_k, train=train, key=key,
        )
    raise ValueError(f"Unknown dispatch mode: {mode}")


def moe_dispatch_grouped(
    x: jnp.ndarray,
    expert_params: Sequence[Any],
    expert_cfgs: Sequence[Any],
    apply_fn: Callable[..., jnp.ndarray],
    gate_weights: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    *,
    capacity: int,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Shape-class-grouped capacity dispatch for heterogeneous expert pools.

    Experts whose static config is identical (same kernel/patch size => same
    parameter shapes) are stacked into one vmapped bank at apply time and run
    as a single program; classes with different shapes stay separate compile
    units. On the flagship config (U-Net kernels 3x3,3x3,5x5,5x5; ViT patches
    4,8,8,16) this collapses 4+4 per-expert programs into 2+3 bank programs —
    fewer, larger kernels, which is what the launch-overhead-bound small-model
    regime needs. The stacking of loop-invariant weights is hoisted by XLA
    inside sampling scans.

    Numerics match moe_dispatch_capacity exactly (same per-expert capacity,
    same first-come-first-served overflow drops).
    """
    from hdmoe_tpu.models.moe_stacked import moe_dispatch_stacked

    groups: dict = {}
    for i, cfg_i in enumerate(expert_cfgs):
        groups.setdefault(cfg_i, []).append(i)

    if text_emb is not None and text_emb.ndim == 3:
        text_emb = text_emb.mean(axis=1)

    out = jnp.zeros_like(x)
    keys = jax.random.split(key, len(groups)) if (train and key is not None) else [None] * len(groups)
    for g, (cfg_i, members) in enumerate(groups.items()):
        stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *[expert_params[i] for i in members])
        gate_g = gate_weights[:, jnp.asarray(members)]
        out = out + moe_dispatch_stacked(
            x, stacked,
            lambda p, xx, tt, txt, *, train=False, key=None, _cfg=cfg_i: apply_fn(
                p, _cfg, xx, tt, txt, train=train, key=key
            ),
            gate_g, time_emb, text_emb, capacity=capacity, train=train, key=keys[g],
        )
    return out
