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


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for a parameter tree under ``mesh``."""
    model_size = mesh.shape["model"]
    expert_size = mesh.shape["expert"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_spec(path, leaf, model_size, expert_size)),
        params,
    )


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place an existing host train state onto the mesh."""
    p_shard = param_shardings(state.params, mesh)
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


def make_sharded_train_step(train_step, mesh: Mesh, donate_state: bool = True):
    """jit the train step with explicit data sharding over the mesh.

    The state keeps whatever shardings it was placed with (pjit infers from
    operand shardings); batch inputs are constrained to ``P("data", ...)``.
    """

    def wrapped(state, latents, text_emb, key):
        # latents are (B, H, W, C) or a microbatch stack (accum, B, H, W, C);
        # either way the batch axis sits 4 dims from the end.
        latents = jax.lax.with_sharding_constraint(
            latents, batch_sharding(mesh, latents.ndim, axis=latents.ndim - 4))
        if text_emb is not None:
            text_emb = jax.lax.with_sharding_constraint(text_emb, batch_sharding(mesh, text_emb.ndim))
        return train_step(state, latents, text_emb, key)

    donate = (0,) if donate_state else ()
    return jax.jit(wrapped, donate_argnums=donate)


def make_sharded_train_devicegen(train_step, latents_fn, text_emb, mesh: Mesh, k: int = 1):
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

    wrapped = make_train_devicegen(train_step, latents_fn, text_emb, k, constrain=constrain)
    return jax.jit(wrapped, donate_argnums=(0,))
