"""Sharding rules + pjit-ed train step.

TPU-native scale-out (no reference analog — SURVEY.md §2.7/§5 record the
reference as single-device with no communication layer):

- **DP**: batch tensors sharded ``P("data", ...)``; XLA psums gradients over
  the ``data`` axis during backward automatically.
- **TP**: MP conv/linear weights (``mpw`` leaves, OIHW / (O, I)) shard their
  output-channel dim over ``model`` when divisible; GSPMD propagates the
  layouts and inserts all-gathers/reduce-scatters over ICI.
- **EP**: stacked homogeneous expert banks (leading expert axis, see
  models/moe_stacked.py) shard that axis over ``expert``.

Everything composes through one ``jax.jit`` with in/out shardings — the
train step stays a single SPMD program.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hdmoe_tpu.train.train_step import TrainState


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: int = 0) -> NamedSharding:
    """Shard the batch dim (``axis``, default leading) over the data axis.

    ``axis=1`` covers microbatch stacks ``(accum, B, H, W, C)`` — the stack
    axis is a scan axis, never sharded; only the per-microbatch batch is."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def _leaf_spec(path, leaf, model_size: int, expert_size: int) -> P:
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    last = keys[-1] if keys else None
    # Stacked expert banks (and per-shape-class banks of heterogeneous
    # pools, models/hdmoem.py:_class_bank_dispatch): leading expert axis ->
    # "expert" mesh axis.
    if any(k in ("stacked_experts", "class_banks") for k in keys) and leaf.ndim >= 1:
        if expert_size > 1 and leaf.shape[0] % expert_size == 0:
            return P("expert", *([None] * (leaf.ndim - 1)))
        return P()
    # MP weights: shard output channels over "model" when divisible.
    if last == "mpw" and leaf.ndim >= 2 and model_size > 1 and leaf.shape[0] % model_size == 0:
        return P("model", *([None] * (leaf.ndim - 1)))
    return P()


def _extend_fsdp(spec: P, leaf, data_size: int, min_size: int) -> P:
    """ZeRO/FSDP: extend a leaf's TP/EP spec with ``"data"`` sharding on the
    largest still-unsharded dim divisible by the data axis size.

    Parameters (and, through :func:`shard_train_state`, their Adam moments)
    are then STORED 1/data_size-sized per chip; GSPMD all-gathers them just
    before use in forward/backward and reduce-scatters the gradients, so the
    train step stays one SPMD program — the scaling-book FSDP recipe, no
    hand-written collectives. Leaves smaller than ``min_size`` elements stay
    replicated (gather latency would exceed the memory saved)."""
    if data_size <= 1 or leaf.ndim == 0 or leaf.size < min_size:
        return spec
    full = list(spec) + [None] * (leaf.ndim - len(spec))
    cands = [(leaf.shape[i], i) for i in range(leaf.ndim)
             if full[i] is None and leaf.shape[i] % data_size == 0]
    if not cands:
        return spec
    _, dim = max(cands, key=lambda t: (t[0], -t[1]))
    full[dim] = "data"
    return P(*full)


def param_shardings(params: Any, mesh: Mesh, fsdp: bool = False,
                    fsdp_min_size: int = 1024):
    """NamedSharding pytree for a parameter tree under ``mesh``.

    ``fsdp=True`` additionally shards every large-enough leaf over the
    ``data`` axis (ZeRO-3 storage; see :func:`_extend_fsdp`), composing with
    the TP (``model``) and EP (``expert``) rules."""
    model_size = mesh.shape["model"]
    expert_size = mesh.shape["expert"]
    data_size = mesh.shape["data"] if fsdp else 1

    def one(path, leaf):
        spec = _leaf_spec(path, leaf, model_size, expert_size)
        if fsdp:
            spec = _extend_fsdp(spec, leaf, data_size, fsdp_min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_train_state(state: TrainState, mesh: Mesh, fsdp: bool = False,
                      fsdp_min_size: int = 1024) -> TrainState:
    """Place an existing host train state onto the mesh.

    ``fsdp=True`` stores parameters AND their shape-matched optimizer
    moments 1/data-sized per chip (ZeRO; :func:`_extend_fsdp`)."""
    p_shard = param_shardings(state.params, mesh, fsdp=fsdp,
                              fsdp_min_size=fsdp_min_size)
    params = jax.device_put(state.params, p_shard)
    # Optimizer state mirrors the parameter tree where shapes match; scalars
    # (counts, schedules) replicate.
    def opt_sharding(leaf):
        return replicated(mesh)

    def place_opt(leaf):
        return jax.device_put(leaf, replicated(mesh))

    # Match param-shaped leaves in opt state to the param shardings by shape.
    flat_params, _ = jax.tree_util.tree_flatten(state.params)
    flat_shards, _ = jax.tree_util.tree_flatten(p_shard)
    shape_to_shard = {}
    for p, s in zip(flat_params, flat_shards):
        shape_to_shard.setdefault((p.shape, p.dtype), s)

    def place(leaf):
        if hasattr(leaf, "shape"):
            s = shape_to_shard.get((leaf.shape, leaf.dtype))
            return jax.device_put(leaf, s if s is not None else replicated(mesh))
        return leaf

    opt_state = jax.tree_util.tree_map(place, state.opt_state)
    step = jax.device_put(state.step, replicated(mesh))
    return TrainState(params=params, opt_state=opt_state, step=step)


def make_sharded_train_step(train_step, mesh: Mesh, donate_state: bool = True,
                            state_shardings=None):
    """jit the train step with explicit data sharding over the mesh.

    The state keeps whatever shardings it was placed with (pjit infers from
    operand shardings); batch inputs are constrained to ``P("data", ...)``.

    ``state_shardings`` (a NamedSharding pytree matching the TrainState, e.g.
    ``jax.tree.map(lambda x: x.sharding, state)``) additionally constrains the
    RETURNED state — under FSDP this pins the updated params/moments back to
    their 1/data-sized storage layout so XLA reduce-scatters gradients into
    the shard instead of round-tripping through a replicated update."""

    def wrapped(state, latents, text_emb, key):
        # latents are (B, H, W, C) or a microbatch stack (accum, B, H, W, C);
        # either way the batch axis sits 4 dims from the end.
        latents = jax.lax.with_sharding_constraint(
            latents, batch_sharding(mesh, latents.ndim, axis=latents.ndim - 4))
        if text_emb is not None:
            text_emb = jax.lax.with_sharding_constraint(text_emb, batch_sharding(mesh, text_emb.ndim))
        new_state, metrics, aux = train_step(state, latents, text_emb, key)
        if state_shardings is not None:
            new_state = jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, new_state, state_shardings)
        return new_state, metrics, aux

    donate = (0,) if donate_state else ()
    return jax.jit(wrapped, donate_argnums=donate)


def make_sharded_train_devicegen(train_step, latents_fn, text_emb, mesh: Mesh,
                                 k: int = 1, state_shardings=None):
    """Mesh version of ``train_step.make_train_devicegen``: on-device data
    generation INSIDE the sharded program, K optimizer steps per dispatch.

    ``latents_fn(key) -> (B, h, w, c)`` is batch-elementwise (the synthetic
    generator + frozen-VAE encode), so the ``P("data", ...)`` constraint
    lets GSPMD partition generation across the data axis — every chip
    produces exactly its own batch shard and the feed path involves NO host
    IO and NO collectives at any mesh size.
    """
    from hdmoe_tpu.train.train_step import make_train_devicegen

    def constrain(lat, te):
        lat = jax.lax.with_sharding_constraint(lat, batch_sharding(mesh, lat.ndim))
        if te is not None:
            te = jax.lax.with_sharding_constraint(te, batch_sharding(mesh, te.ndim))
        return lat, te

    inner = make_train_devicegen(train_step, latents_fn, text_emb, k, constrain=constrain)
    if state_shardings is None:
        return jax.jit(inner, donate_argnums=(0,))

    def wrapped(state, key):
        out = inner(state, key)
        return (jax.tree_util.tree_map(jax.lax.with_sharding_constraint,
                                       out[0], state_shardings),) + tuple(out[1:])

    return jax.jit(wrapped, donate_argnums=(0,))
