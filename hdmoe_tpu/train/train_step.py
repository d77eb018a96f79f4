"""The jitted training step: one XLA executable per optimizer update.

The reference hot loop (Utils/training.py:114-197) runs ~10 separate GPU
launches per step with host syncs between them (sigma draw, noise add, mask
gen, model forward, loss, backward, clip, step, scheduler). Here the entire
step — sigma sampling, noising, zeta/mask schedules, forward, loss, backward,
global-norm clip, multi-group AdamW update, MP weight projection — traces
into ONE jit (and later pjit) program: no host round-trips, full XLA fusion.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hdmoe_tpu.models.configs import HDMOEMConfig
from hdmoe_tpu.models.hdmoem import precond_apply
from hdmoe_tpu.train.loss import EDMLossConfig, edm_loss
from hdmoe_tpu.train.optim import OptimConfig, make_optimizer, project_mp_weights
from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
from hdmoe_tpu.train.sigma import sample_sigma_hybrid


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


@dataclass(frozen=True)
class TrainConfig:
    """Step-level hyperparameters from the reference config dicts
    (Utils/configs.py:36-70 + training.py:125-154)."""

    sigma_min: float = 0.002
    sigma_max: float = 80.0
    p_mean: float = -1.2
    p_std: float = 1.6
    extreme_prob: float = 0.5
    transition_point: float = -1.2  # = p_mean (training.py:151)
    softness: float = 1.6  # = p_std (training.py:152)
    # Flash-attention input layout for the TRAIN step. Round 4 pinned "std"
    # because the transposed pipeline's BACKWARD paid explicit transposes
    # (2x dense at tg64 b4, artifacts/tg64_bwd_recheck_r4.json). Round 5's
    # native transposed single-pass backward (_smallhead_backward_t,
    # ops/pallas/flash_attention.py) deleted those transposes and FLIPPED
    # the ranking on an idle-host rerun of the same protocol
    # (artifacts/tg64_bwd_recheck_r5_idle.json): t 54.9 ms vs std 57.9 vs
    # dense 70.9 at b4, and t 121.1 vs std 139.3 at b16 (where dense OOMs).
    # Training now matches sampling's "t" layout everywhere.
    attn_layout: str = "t"


def init_train_state(params, optim_cfg: OptimConfig) -> TrainState:
    tx = make_optimizer(optim_cfg)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _component_grad_norms(grads) -> Dict[str, jnp.ndarray]:
    """Per-component global grad norms with the reference logger's vocabulary
    (graphs/logger.py:252-254)."""
    net = grads["net"]
    names = {
        "Unet_experts": "unet_experts",
        "VIT_experts": "vit_experts",
        "Unet_router": "unet_router",
        "vit_router": "vit_router",
        "scaling_net": "scaling_net",
        "cross_attn": "cross_attn",
    }
    out = {}
    for log_name, key in names.items():
        if key in net:
            leaves = jax.tree_util.tree_leaves(net[key])
            sq = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
            out[f"{log_name}_grad_norm"] = jnp.sqrt(sq)
    return out


def _make_grads_fn(
    model_cfg: HDMOEMConfig,
    loss_cfg: EDMLossConfig,
    train_cfg: TrainConfig,
    unet_mask_gen: MaskGenerator,
    vit_mask_gen: MaskGenerator,
    zeta_sched: ZetaSchedule,
):
    """The per-batch gradient computation shared by the plain step and the
    gradient-accumulation step: sigma draw, noising, schedules, forward,
    loss, backward — everything up to (but not including) the optimizer.

    grads_fn(params, step, latents, text_emb, key) ->
        (grads, metrics dict, aux dict)
    """

    def grads_fn(params, step, latents, text_emb, key):
        # trace-time flash-layout pin (TrainConfig.attn_layout): the context
        # wraps the whole fwd+bwd trace in _grads_body
        from hdmoe_tpu.ops.attention import attn_layout as _attn_layout

        with _attn_layout(train_cfg.attn_layout):
            return _grads_body(params, step, latents, text_emb, key)

    def _grads_body(params, step, latents, text_emb, key):
        b = latents.shape[0]
        k_sigma, k_noise, k_model = jax.random.split(key, 3)
        sigma = sample_sigma_hybrid(
            k_sigma, b,
            sigma_min=train_cfg.sigma_min, sigma_max=train_cfg.sigma_max,
            p_mean=train_cfg.p_mean, p_std=train_cfg.p_std,
            extreme_prob=train_cfg.extreme_prob,
        )
        noise = jax.random.normal(k_noise, latents.shape) * sigma
        x_noised = latents + noise
        zeta = zeta_sched(step)
        unet_mask = unet_mask_gen(sigma, step)
        vit_mask = vit_mask_gen(sigma, step)

        def loss_fn(params):
            out = precond_apply(
                params, model_cfg, x_noised, sigma, text_emb, unet_mask, vit_mask, zeta,
                transition_point=train_cfg.transition_point, softness=train_cfg.softness,
                return_log_var=True, train=True, key=k_model,
            )
            ld = edm_loss(loss_cfg, latents, sigma, out)
            return ld["loss"], (ld, out)

        (_, (loss_dict, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        metrics = dict(loss_dict)
        metrics["zeta"] = jnp.asarray(zeta)
        metrics["log_var"] = (
            out["log_var"].mean() if out["log_var"] is not None else jnp.asarray(0.0)
        )
        metrics["sigma_mean"] = sigma.mean()
        metrics["sigma_min"] = sigma.min()
        metrics["sigma_max"] = sigma.max()
        metrics["sigma_std"] = sigma.reshape(-1).std()

        aux = {
            "unet_probs": out["Unet_router_loss"],
            "vit_probs": out["vit_router_loss"],
            "scaling_factors": out["scaling_net_out"],
            "out_gate": out["out_gate"].mean(axis=(1, 2)),  # (B, 2) pixel-gate means
            "sigma": sigma.reshape(-1),
        }
        return grads, metrics, aux

    return grads_fn


def make_train_step(
    model_cfg: HDMOEMConfig,
    loss_cfg: EDMLossConfig,
    optim_cfg: OptimConfig,
    train_cfg: TrainConfig,
    unet_mask_gen: MaskGenerator,
    vit_mask_gen: MaskGenerator,
    zeta_sched: ZetaSchedule,
):
    """Build the pure train-step function (jit/pjit it at the call site).

    step(state, latents(NHWC), text_emb|None, key) ->
        (new_state, metrics dict, model aux dict for router/gating logging)
    """
    tx = make_optimizer(optim_cfg)
    grads_fn = _make_grads_fn(
        model_cfg, loss_cfg, train_cfg, unet_mask_gen, vit_mask_gen, zeta_sched
    )

    def train_step(
        state: TrainState,
        latents: jnp.ndarray,
        text_emb: Optional[jnp.ndarray],
        key: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        grads, metrics, aux = grads_fn(state.params, state.step, latents, text_emb, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = project_mp_weights(params)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics["grad_norm_total"] = optax.global_norm(grads)
        metrics.update(_component_grad_norms(grads))
        return new_state, metrics, aux

    return train_step


def make_train_step_accum(
    model_cfg: HDMOEMConfig,
    loss_cfg: EDMLossConfig,
    optim_cfg: OptimConfig,
    train_cfg: TrainConfig,
    unet_mask_gen: MaskGenerator,
    vit_mask_gen: MaskGenerator,
    zeta_sched: ZetaSchedule,
    accum: int,
    constrain=None,
):
    """Gradient accumulation: ONE optimizer update from ``accum``
    microbatches, gradients averaged — the effective batch is
    ``accum * B`` with the memory footprint of one microbatch.

    The reference has no analog (single-GPU, fixed batch); this is the
    standard large-effective-batch recipe, TPU-shaped: a ``lax.scan`` over
    the microbatch axis keeps one gradient buffer live (vs ``vmap``, which
    would materialize all ``accum`` backward passes), and XLA keeps the
    whole thing one program — no host round-trips between microbatches.

    Semantics pinned by tests/test_grad_accum.py: returned gradients equal
    the arithmetic mean of per-microbatch gradients (== the gradient of the
    mean of per-microbatch losses). Note batch-statistics losses (router
    balance) are computed per microbatch and averaged, which is NOT
    identical to one big-batch pass — same trade every torch/DDP
    accumulation makes. Every microbatch draws its own sigma/noise/mask,
    so the sigma distribution matches ``accum`` independent steps.

    step(state, latents(A, B, H, W, C), text_emb|None, key) ->
        (new_state(+1 step), metrics averaged over microbatches
         (sigma_min/max are extrema), aux of the LAST microbatch)

    ``constrain(latents_b) -> latents_b`` (optional) attaches the mesh
    batch-sharding constraint inside the scan body (axis 0 of a microbatch
    is the batch dim — the (A, B, ...) stack itself is never sharded).
    """
    from jax import lax

    tx = make_optimizer(optim_cfg)
    grads_fn = _make_grads_fn(
        model_cfg, loss_cfg, train_cfg, unet_mask_gen, vit_mask_gen, zeta_sched
    )
    assert accum >= 1

    def train_step(
        state: TrainState,
        latents_a: jnp.ndarray,
        text_emb: Optional[jnp.ndarray],
        key: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        assert latents_a.ndim == 5 and latents_a.shape[0] == accum, (
            f"expected (accum={accum}, B, H, W, C) microbatch stack, got "
            f"{latents_a.shape}"
        )
        keys = jax.random.split(key, accum)

        def body(carry, inp):
            grad_sum, _ = carry
            lat, kk = inp
            if constrain is not None:
                lat = constrain(lat)
            grads, metrics, aux = grads_fn(state.params, state.step, lat, text_emb, kk)
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            return (grad_sum, aux), metrics

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        # aux carry template: one microbatch's aux structure (zeros; the
        # scan overwrites it every iteration, the last one survives)
        aux0 = jax.eval_shape(
            lambda: grads_fn(state.params, state.step, latents_a[0], text_emb, keys[0])[2]
        )
        aux0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), aux0)

        (grad_sum, aux), metrics_a = lax.scan(body, (zero_grads, aux0), (latents_a, keys))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grad_sum)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = project_mp_weights(params)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)

        metrics = {
            k: (v.max(0) if k == "sigma_max" else v.min(0) if k == "sigma_min"
                else v.mean(0))
            for k, v in metrics_a.items()
        }
        metrics["grad_norm_total"] = optax.global_norm(grads)
        metrics.update(_component_grad_norms(grads))
        return new_state, metrics, aux

    return train_step


def _scan_k_steps(body, state, keys):
    """lax.scan ``body`` over per-step keys; return (state, last-step
    metrics, last-step aux) — the shared telemetry contract of every
    multi-step wrapper (host logging samples at >= K-step granularity)."""
    from jax import lax

    state, (metrics_k, aux_k) = lax.scan(body, state, keys)
    metrics = jax.tree_util.tree_map(lambda a: a[-1], metrics_k)
    aux = jax.tree_util.tree_map(lambda a: a[-1], aux_k)
    return state, metrics, aux


def make_train_multistep(train_step, k: int):
    """Device-side multi-step loop: ``lax.scan`` over K optimizer steps.

    The round-3 feed measurement (artifacts/feed_throughput_r3.json) showed
    the full training loop is bound by per-step dispatch + transfer overhead
    (neither the native data generator nor reduced telemetry moved it) —
    every step pays host->device latency for the batch plus a program
    dispatch. This wrapper amortizes both K-fold: the host stacks K batches
    into one (K, B, ...) transfer and ONE dispatch runs K full optimizer
    updates on device. Telemetry returns the LAST step's metrics/aux (the
    host logger samples at >= K-step granularity, same spirit as
    RunConfig.telemetry_every).

    ``multi(state, latents_k(K,B,H,W,C), text_emb(B,...)|None, key)`` —
    the text embedding is the fixed-prompt embedding shared by every step
    (train_loop computes it once).
    """
    def multi(state, latents_k, text_emb, key):
        keys = jax.random.split(key, k)

        def body(st, inp):
            lat, kk = inp
            st, metrics, aux = train_step(st, lat, text_emb, kk)
            return st, (metrics, aux)

        return _scan_k_steps(body, state, (latents_k, keys))

    return multi


def make_train_devicegen(train_step, latents_fn, text_emb, k: int, constrain=None):
    """K optimizer steps per dispatch with ON-DEVICE data generation.

    The terminal form of the round-3 feed finding (artifacts/
    feed_throughput_r3.json): host generator choice and telemetry cadence
    barely moved the full loop because it is bound by per-step H2D image
    transfer + dispatch. Here the batch never exists on the host at all —
    ``latents_fn(key) -> (B, h, w, c) latents`` runs inside the program
    (device synthetic pixels + frozen-VAE encode), and ``lax.scan`` runs K
    full optimizer steps per dispatch. The loop becomes compute-bound.

    ``devicegen(state, key)`` — metrics/aux are the LAST step's, as in
    ``make_train_multistep``. ``text_emb`` (the fixed-prompt embedding) is
    closed over as a trace constant. ``constrain(lat, te) -> (lat, te)``
    (optional) lets the mesh wrapper (parallel/sharding.py) attach
    ``with_sharding_constraint`` without duplicating the scan body.
    """

    def devicegen(state, key):
        keys = jax.random.split(key, k)

        def body(st, kk):
            k_lat, k_step = jax.random.split(kk)
            lat, te = latents_fn(k_lat), text_emb
            if constrain is not None:
                lat, te = constrain(lat, te)
            st, metrics, aux = train_step(st, lat, te, k_step)
            return st, (metrics, aux)

        return _scan_k_steps(body, state, keys)

    return devicegen
