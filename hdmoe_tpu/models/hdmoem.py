"""HDMOEM assembly and EDM preconditioning wrapper, TPU-native.

Functional re-design of reference models/model_config1.py + model_config2.py.
One code path serves both reference variants:

- ``variant="config1"``: learned ``Scaling_router`` soft path gate + dynamic
  query/context swap in the fusion cross-attention
  (model_config1.py:138-140, 246-249, 277-283).
- ``variant="config2"``: analytic sigmoid path schedule
  ``vit_w = sigmoid((log_sigma - transition_point)/softness)`` and fixed
  query=U-Net / context=ViT fusion (model_config2.py:244-250, 279-280).

Activations are NHWC. The data-dependent per-expert dispatch loop of the
reference is replaced by static-shape dispatch (models/moe.py). All forward
functions jit cleanly; train-time stochasticity consumes explicit PRNG keys.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from hdmoe_tpu.models import components as comp
from hdmoe_tpu.models import moe
from hdmoe_tpu.models.configs import HDMOEMConfig
from hdmoe_tpu.ops import mp
from hdmoe_tpu.ops.attention import mp_attention_apply, mp_attention_init


def _unet_expert_cfg(cfg: HDMOEMConfig, i: int) -> comp.UnetExpertCfg:
    return comp.UnetExpertCfg(
        img_resolution=cfg.img_resolution,
        img_channels=cfg.internal_channels,
        time_emb_dim=cfg.time_emb_dim,
        text_emb_dim=cfg.text_emb_dim,
        channel_mult=cfg.unet_channel_mult,
        model_channels=cfg.unet_model_channels,
        channel_mult_emb=cfg.unet_channel_mult_emb,
        num_blocks=cfg.unet_num_blocks,
        kernel_size=tuple(cfg.unet_kernel_sizes[i]),
        label_balance=cfg.unet_label_balance,
        concat_balance=cfg.unet_concat_balance,
    )


def _vit_expert_cfg(cfg: HDMOEMConfig, i: int) -> comp.VitExpertCfg:
    import math

    patch = cfg.vit_patch_sizes[i]
    return comp.VitExpertCfg(
        num_heads=cfg.vit_num_heads,
        num_groups=cfg.vit_num_groups,
        in_channels=cfg.internal_channels,
        seq_ln=math.ceil(cfg.img_resolution / patch) ** 2,
        emb_dim=cfg.vit_emb_size,
        num_blocks=cfg.vit_num_blocks,
        patch_size=patch,
        time_dim=cfg.time_emb_dim,
        text_dim=cfg.text_emb_dim,
        use_flash=cfg.use_flash,
        attn_impl=cfg.attn_impl,
        pipeline_blocks=cfg.pipeline_vit_blocks,
    )


def _class_groups(cfg: HDMOEMConfig, cfg_fn):
    """Group expert indices by identical static config (same kernel/patch
    size => same parameter shapes). Deterministic first-occurrence order.

    This is how heterogeneity survives expert parallelism: per-expert
    kernel/patch sizes are THE defining feature of the reference
    (model_config1.py:152-177), and a single weight-stacked bank would
    homogenize them — so each shape class gets its OWN bank, sharded over
    the expert mesh axis (SURVEY.md §7 hard-part 2)."""
    groups: dict = {}
    for i in range(cfg.num_experts):
        groups.setdefault(cfg_fn(cfg, i), []).append(i)
    return list(groups.items())


def _init_experts(cfg: HDMOEMConfig, key: jax.Array, init_fn, cfg_fn):
    """Heterogeneous pools are lists of separate trees; stacked banks are one
    vmapped tree under "stacked_experts"; class banks are one vmapped tree
    PER shape class under "class_banks" (both sharded over the expert mesh
    axis, parallel/sharding.py:_leaf_spec)."""
    from hdmoe_tpu.models.moe_stacked import stacked_expert_init

    if cfg.expert_sharing == "stacked":
        ecfg = cfg_fn(cfg, 0)
        return {"stacked_experts": stacked_expert_init(key, cfg.num_experts, lambda k: init_fn(k, ecfg))}
    if cfg.expert_sharing == "class_banks":
        groups = _class_groups(cfg, cfg_fn)
        kclass = jax.random.split(key, len(groups))
        return {
            "class_banks": {
                f"class{g}": stacked_expert_init(
                    kclass[g], len(members), lambda k, _e=ecfg: init_fn(k, _e)
                )
                for g, (ecfg, members) in enumerate(groups)
            }
        }
    keys = jax.random.split(key, cfg.num_experts)
    return [init_fn(keys[i], cfg_fn(cfg, i)) for i in range(cfg.num_experts)]


def hdmoem_init(key: jax.Array, cfg: HDMOEMConfig) -> dict:
    """Initialize the dual-path MoE denoiser (HDMOEM.__init__, model_config2.py:74-204)."""
    keys = jax.random.split(key, 12 + 2 * cfg.num_experts)
    ki = iter(keys)
    params: dict = {
        "input_proj": mp.mp_conv_init(next(ki), cfg.in_channels, cfg.internal_channels, (3, 3)),
        "fourier": mp.mp_fourier_init(next(ki), cfg.time_emb_dim // 2, cfg.fourier_bandwidth),
        "out_fourier1": mp.mp_conv_init(next(ki), cfg.time_emb_dim // 2, cfg.time_emb_dim * 2),
        "out_fourier2": mp.mp_conv_init(next(ki), cfg.time_emb_dim * 2, cfg.time_emb_dim),
        "unet_router": comp.router_init(next(ki), cfg.internal_channels, cfg.time_emb_dim, cfg.num_experts),
        "vit_router": comp.router_init(next(ki), cfg.internal_channels, cfg.time_emb_dim, cfg.num_experts),
        "alpha_txt": jnp.zeros([], dtype=jnp.float32),
        "unet_experts": _init_experts(cfg, next(ki), comp.unet_expert_init, _unet_expert_cfg),
        "vit_experts": _init_experts(cfg, next(ki), comp.vit_expert_init, _vit_expert_cfg),
        "cross_attn": mp_attention_init(
            next(ki),
            cfg.vit_num_heads,
            cfg.internal_channels,
            cfg.img_resolution**2,
            context_dim=cfg.internal_channels,
            is_cross_attn=True,
        ),
        "gate1": mp.mp_conv_init(next(ki), cfg.internal_channels * 2, cfg.internal_channels, (1, 1)),
        "gate2": mp.mp_conv_init(next(ki), cfg.internal_channels, 2, (1, 1)),
        "output_proj": mp.mp_conv_init(next(ki), cfg.internal_channels, cfg.in_channels, (3, 3)),
    }
    if cfg.text_emb_dim > 0:
        # Unconditional configs omit the text cross-attention entirely (its
        # projections would have zero-width weights otherwise).
        params["cross_attn_text"] = mp_attention_init(
            next(ki),
            cfg.vit_num_heads,
            cfg.internal_channels,
            cfg.img_resolution**2,
            context_dim=cfg.text_emb_dim,
            is_cross_attn=True,
        )
    if cfg.variant == "config1":
        params["scaling_net"] = comp.scaling_router_init(next(ki), emb_dim=cfg.time_emb_dim, num_experts=2)
    return params


def hdmoem_apply(
    params: dict,
    cfg: HDMOEMConfig,
    x: jnp.ndarray,
    time_vec: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    unet_router_mask: Optional[jnp.ndarray],
    vit_router_mask: Optional[jnp.ndarray],
    zeta: float,
    transition_point: float = -1.2,
    softness: float = 1.2,
    alpha_routing: float = 10.0,
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
):
    """Dual-path MoE denoiser forward (HDMOEM.forward, model_config2.py:206-303).

    Args:
        x: (B, H, W, C_in) NHWC noisy input.
        time_vec: (B,) conditioning scalar (c_noise = log(sigma)/4 under the
            preconditioner).
        text_emb: (B, S, text_dim) CLIP sequence, or None for unconditional.
        unet_router_mask / vit_router_mask: (B, E) binary specialization masks.
        zeta: router exploration noise scale (traced scalar is fine).
        transition_point / softness: config2 analytic path schedule params.
        alpha_routing: config1 query/context swap sharpness.

    Returns the reference 7-tuple:
        (out, unet_gate_probs, unet_raw, vit_gate_probs, vit_raw,
         scaling_factors, out_gate)
    """
    if cfg.conv_impl != "xla":
        # Trace-time conv lowering selection (ops/mp.py:conv_layout); the
        # context wraps the whole forward so every MP conv under it lowers
        # the same way.
        with mp.conv_layout(cfg.conv_impl):
            return hdmoem_apply(
                params, replace(cfg, conv_impl="xla"), x, time_vec, text_emb,
                unet_router_mask, vit_router_mask, zeta,
                transition_point=transition_point, softness=softness,
                alpha_routing=alpha_routing, train=train, key=key,
            )
    b, h, w, c = x.shape
    keys = jax.random.split(key, 5) if (train and key is not None) else [None] * 5

    # Mixed precision: activations in compute_dtype (params stay fp32 and are
    # cast at use inside mp_conv_apply); router logits/softmaxes stay fp32.
    cdt = jnp.dtype(cfg.compute_dtype)
    x = x.astype(cdt)
    if text_emb is not None:
        text_emb = text_emb.astype(cdt)

    time_embed = mp.mp_fourier_apply(params["fourier"], time_vec.astype(cdt))
    time_embed = mp.mp_conv_apply(params["out_fourier1"], time_embed)
    time_embed = mp.mp_conv_apply(params["out_fourier2"], mp.mp_silu(time_embed))
    x_feats = mp.mp_conv_apply(params["input_proj"], x)

    if cfg.variant == "config1":
        scaling_factors = comp.scaling_router_apply(
            params["scaling_net"], time_embed, zeta, train=train, key=keys[0]
        )  # (B, 2): [:,0]=vit, [:,1]=unet
        scaling_vit = scaling_factors[:, 0].reshape(-1, 1, 1, 1)
        scaling_unet = scaling_factors[:, 1].reshape(-1, 1, 1, 1)
    else:
        log_sigma = time_vec * 4.0
        vit_weight = jax.nn.sigmoid((log_sigma - transition_point) / softness).reshape(-1, 1, 1, 1)
        scaling_vit = (vit_weight + 1e-2) * 2.0
        scaling_unet = ((1.0 - vit_weight) + 1e-2) * 2.0
        scaling_factors = jnp.concatenate([scaling_vit, scaling_unet], axis=-1).reshape(-1, 2)

    in_unet_router = scaling_unet.astype(x_feats.dtype) * x_feats
    in_vit_router = scaling_vit.astype(x_feats.dtype) * x_feats

    out_vit_router, vit_gate_probs, vit_raw = comp.router_apply(
        params["vit_router"], in_vit_router, time_embed, mask=vit_router_mask, zeta=zeta,
        top_k=cfg.top_k, train=train, key=keys[1],
    )
    out_unet_router, unet_gate_probs, unet_raw = comp.router_apply(
        params["unet_router"], in_unet_router, time_embed, mask=unet_router_mask, zeta=zeta,
        top_k=cfg.top_k, train=train, key=keys[2],
    )

    capacity_limited = (
        cfg.dispatch in ("capacity", "einsum", "pallas", "grouped")
        or cfg.expert_sharing in ("stacked", "class_banks")
    )
    if capacity_limited and cfg.capacity_policy == "priority":
        # Confidence-prioritized selection + overflow-to-next-choice
        # (models/moe.py:reroute_overflow): after this pre-pass every expert
        # holds <= capacity tokens, so the FCFS selection inside the dispatch
        # paths below never drops a surviving token. Under all-to-all EP the
        # guarantee is per-global-expert, not per-shard (local capacity can
        # still clip) — best effort there. Capacity may be per-expert
        # (capacity_profile_*; scalar on the bank paths).
        out_unet_router = moe.reroute_overflow(
            out_unet_router, unet_gate_probs, cfg.capacity_for(b, "unet"))
        out_vit_router = moe.reroute_overflow(
            out_vit_router, vit_gate_probs, cfg.capacity_for(b, "vit"))

    if cfg.expert_sharing == "stacked" and cfg.ep_all_to_all:
        from hdmoe_tpu.parallel.ep import all_to_all_moe_dispatch, current_ep_context

        ep_ctx = current_ep_context()
        assert ep_ctx is not None, "ep_all_to_all=True needs an active ep_context(mesh)"
        mesh_, daxis, eaxis = ep_ctx
        cap = cfg.capacity(b)
        out_unet_expert = all_to_all_moe_dispatch(
            in_unet_router, params["unet_experts"]["stacked_experts"],
            partial(_stacked_unet_fn, ecfg=_unet_expert_cfg(cfg, 0)),
            out_unet_router, time_embed, text_emb, mesh_,
            capacity=cap, data_axis=daxis, expert_axis=eaxis, train=train, key=keys[3],
        )
        out_vit_expert = all_to_all_moe_dispatch(
            in_vit_router, params["vit_experts"]["stacked_experts"],
            partial(_stacked_vit_fn, ecfg=_vit_expert_cfg(cfg, 0)),
            out_vit_router, time_embed, text_emb, mesh_,
            capacity=cap, data_axis=daxis, expert_axis=eaxis, train=train, key=keys[4],
        )
    elif cfg.expert_sharing == "class_banks":
        cap = cfg.capacity(b)
        out_unet_expert = _class_bank_dispatch(
            params["unet_experts"]["class_banks"], cfg, _unet_expert_cfg, _stacked_unet_fn,
            in_unet_router, out_unet_router, time_embed, text_emb, cap, train, keys[3],
        )
        out_vit_expert = _class_bank_dispatch(
            params["vit_experts"]["class_banks"], cfg, _vit_expert_cfg, _stacked_vit_fn,
            in_vit_router, out_vit_router, time_embed, text_emb, cap, train, keys[4],
        )
    elif cfg.expert_sharing == "stacked":
        from hdmoe_tpu.models.moe_stacked import moe_dispatch_stacked

        cap = cfg.capacity(b)
        movement = cfg.dispatch if cfg.dispatch in ("pallas", "einsum") else "gather"
        out_unet_expert = moe_dispatch_stacked(
            in_unet_router, params["unet_experts"]["stacked_experts"],
            partial(_stacked_unet_fn, ecfg=_unet_expert_cfg(cfg, 0)),
            out_unet_router, time_embed, text_emb, capacity=cap, train=train, key=keys[3],
            movement=movement, top_k=cfg.top_k,
        )
        out_vit_expert = moe_dispatch_stacked(
            in_vit_router, params["vit_experts"]["stacked_experts"],
            partial(_stacked_vit_fn, ecfg=_vit_expert_cfg(cfg, 0)),
            out_vit_router, time_embed, text_emb, capacity=cap, train=train, key=keys[4],
            movement=movement, top_k=cfg.top_k,
        )
    elif cfg.dispatch == "grouped":
        cap = cfg.capacity(b)
        out_unet_expert = moe.moe_dispatch_grouped(
            in_unet_router, params["unet_experts"], [_unet_expert_cfg(cfg, i) for i in range(cfg.num_experts)],
            comp.unet_expert_apply, out_unet_router, time_embed, text_emb,
            capacity=cap, train=train, key=keys[3],
        )
        out_vit_expert = moe.moe_dispatch_grouped(
            in_vit_router, params["vit_experts"], [_vit_expert_cfg(cfg, i) for i in range(cfg.num_experts)],
            comp.vit_expert_apply, out_vit_router, time_embed, text_emb,
            capacity=cap, train=train, key=keys[4],
        )
    else:
        unet_fns = [
            partial(_unet_fn, params["unet_experts"][i], _unet_expert_cfg(cfg, i), cfg.remat_experts)
            for i in range(cfg.num_experts)
        ]
        vit_fns = [
            partial(_vit_fn, params["vit_experts"][i], _vit_expert_cfg(cfg, i), cfg.remat_experts)
            for i in range(cfg.num_experts)
        ]
        limited = cfg.dispatch in ("capacity", "einsum", "pallas")
        out_unet_expert = moe.moe_dispatch(
            in_unet_router, unet_fns, out_unet_router, time_embed, text_emb,
            mode=cfg.dispatch, capacity=cfg.capacity_for(b, "unet") if limited else None,
            top_k=cfg.top_k, train=train, key=keys[3],
        )
        out_vit_expert = moe.moe_dispatch(
            in_vit_router, vit_fns, out_vit_router, time_embed, text_emb,
            mode=cfg.dispatch, capacity=cfg.capacity_for(b, "vit") if limited else None,
            top_k=cfg.top_k, train=train, key=keys[4],
        )

    out_unet_flat = out_unet_expert.reshape(b, h * w, cfg.internal_channels)
    out_vit_flat = out_vit_expert.reshape(b, h * w, cfg.internal_channels)

    if cfg.variant == "config1":
        # Dynamic query/context swap (model_config1.py:277-283).
        vit_strength = (scaling_vit - scaling_unet).reshape(-1, 1, 1)
        vit_is_stronger = jax.nn.sigmoid(alpha_routing * vit_strength)
        query = vit_is_stronger * out_vit_flat + (1.0 - vit_is_stronger) * out_unet_flat
        context = vit_is_stronger * out_unet_flat + (1.0 - vit_is_stronger) * out_vit_flat
    else:
        query, context = out_unet_flat, out_vit_flat

    out_final_attn = mp_attention_apply(
        params["cross_attn"], query, context=context, gain_s=1.0, gain_t=1.0,
        num_heads=cfg.vit_num_heads, attn_balance=0.5, is_cross_attn=True, impl=cfg.attn_impl,
    )
    if text_emb is not None and "cross_attn_text" in params:
        final_feats = mp_attention_apply(
            params["cross_attn_text"], out_final_attn, context=text_emb, gain_s=1.0, gain_t=1.0,
            num_heads=cfg.vit_num_heads, attn_balance=0.5, is_cross_attn=True, impl=cfg.attn_impl,
        )
        final_feats = out_final_attn + params["alpha_txt"] * (final_feats - out_final_attn)
    else:
        final_feats = out_final_attn

    out_final_attn_img = final_feats.reshape(b, h, w, cfg.internal_channels)
    in_gate = mp.mp_cat(out_unet_expert, out_final_attn_img, axis=-1)
    out_gate = mp.mp_conv_apply(params["gate1"], in_gate)
    out_gate = mp.mp_conv_apply(params["gate2"], mp.mp_silu(out_gate))
    out_gate = jax.nn.softmax(out_gate, axis=-1)  # (B, H, W, 2) per-pixel path gate
    wx = out_gate[..., 0:1]
    wa = out_gate[..., 1:2]
    out_gated_attn = wx * out_unet_expert + wa * out_final_attn_img
    out = mp.mp_sum(out_unet_expert, out_gated_attn, t=0.5)
    out = mp.mp_conv_apply(params["output_proj"], out)
    return out, unet_gate_probs, unet_raw, vit_gate_probs, vit_raw, scaling_factors, out_gate


def _class_bank_dispatch(
    banks, cfg: HDMOEMConfig, cfg_fn, fn, x, gate_weights, time_emb, text_emb,
    capacity: int, train: bool, key,
):
    """Shape-class-banked heterogeneous MoE dispatch, optionally expert-
    parallel.

    Each shape class (group of experts with identical kernel/patch size) is
    ONE stacked bank; classes run as separate compile units, so the pool
    stays heterogeneous at any expert count. Without an EP context each
    class dispatches via moe_dispatch_stacked (single-program vmapped bank);
    with ``cfg.ep_all_to_all`` inside an ep_context(mesh), each class's bank
    shards over the expert mesh axis and tokens ride the explicit
    all-to-all exchange (parallel/ep.py) — the class's member count must
    divide the expert axis size. Capacity semantics (and the optional
    ``capacity_policy="priority"`` pre-pass, applied upstream on the full
    gate matrix) match the flat dispatch paths exactly.
    """
    from hdmoe_tpu.models.moe_stacked import moe_dispatch_stacked

    groups = _class_groups(cfg, cfg_fn)
    if text_emb is not None and text_emb.ndim == 3:
        text_emb = text_emb.mean(axis=1)
    keys = jax.random.split(key, len(groups)) if (train and key is not None) else [None] * len(groups)

    ep_ctx = None
    if cfg.ep_all_to_all:
        from hdmoe_tpu.parallel.ep import current_ep_context

        ep_ctx = current_ep_context()
        assert ep_ctx is not None, "ep_all_to_all=True needs an active ep_context(mesh)"

    out = jnp.zeros_like(x)
    for g, (ecfg, members) in enumerate(groups):
        gate_g = gate_weights[:, jnp.asarray(members)]
        bank = banks[f"class{g}"]
        if ep_ctx is not None:
            from hdmoe_tpu.parallel.ep import all_to_all_moe_dispatch

            mesh_, daxis, eaxis = ep_ctx
            out = out + all_to_all_moe_dispatch(
                x, bank, partial(fn, ecfg=ecfg), gate_g, time_emb, text_emb, mesh_,
                capacity=capacity, data_axis=daxis, expert_axis=eaxis, train=train, key=keys[g],
            )
        else:
            out = out + moe_dispatch_stacked(
                x, bank, partial(fn, ecfg=ecfg), gate_g, time_emb, text_emb,
                capacity=capacity, train=train, key=keys[g],
                movement=(cfg.dispatch if cfg.dispatch in ("pallas", "einsum")
                          else "gather"), top_k=cfg.top_k,
            )
    return out


def _expert_fn(apply, p, ecfg, remat, x, time_emb, text_emb, *, train, key):
    """Single-expert call, optionally rematerialized (recompute-in-backward)."""

    def inner(p_, x_, t_, tx_, key_):
        return apply(p_, ecfg, x_, t_, tx_, train=train, key=key_)

    if remat:
        inner = jax.checkpoint(inner)
    return inner(p, x, time_emb, text_emb, key)


def _unet_fn(p, ecfg, remat, x, time_emb, text_emb, *, train, key):
    return _expert_fn(comp.unet_expert_apply, p, ecfg, remat, x, time_emb, text_emb, train=train, key=key)


def _vit_fn(p, ecfg, remat, x, time_emb, text_emb, *, train, key):
    return _expert_fn(comp.vit_expert_apply, p, ecfg, remat, x, time_emb, text_emb, train=train, key=key)


def _stacked_unet_fn(p, x, time_emb, text_emb, *, ecfg, train, key):
    return comp.unet_expert_apply(p, ecfg, x, time_emb, text_emb, train=train, key=key)


def _stacked_vit_fn(p, x, time_emb, text_emb, *, ecfg, train, key):
    return comp.vit_expert_apply(p, ecfg, x, time_emb, text_emb, train=train, key=key)


# ---------------------------------------------------------------------------
# EDM preconditioning wrapper
# ---------------------------------------------------------------------------


def precond_init(key: jax.Array, cfg: HDMOEMConfig) -> dict:
    """preconditioned_HDMOEM.__init__ (model_config2.py:306-387)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "net": hdmoem_init(k1, cfg),
        "log_var_fourier": mp.mp_fourier_init(k2, cfg.log_var_channels),
        "log_var_linear": mp.mp_conv_init(k3, cfg.log_var_channels, 1),
    }


def precond_apply(
    params: dict,
    cfg: HDMOEMConfig,
    x: jnp.ndarray,
    sigma: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    unet_router_mask: Optional[jnp.ndarray],
    vit_router_mask: Optional[jnp.ndarray],
    zeta: float,
    transition_point: float = -1.2,
    softness: float = 1.2,
    alpha_routing: float = 10.0,
    return_log_var: bool = False,
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> dict:
    """EDM preconditioning forward (preconditioned_HDMOEM.forward, model_config2.py:389-468).

    ``c_skip = sd^2/(s^2+sd^2)``, ``c_out = s*sd/sqrt(s^2+sd^2)``,
    ``c_in = 1/sqrt(sd^2+s^2)``, ``c_noise = log(s)/4``. Note the reference
    applies the skip to the *scaled* input: ``D_x = c_skip*(c_in*x) + c_out*F``
    (model_config2.py:440-449) — preserved bit-for-bit here.

    Returns the reference output dict: denoised / Unet_router_loss / Unet_raw /
    vit_router_loss / vit_raw / scaling_net_out / out_gate / log_var.
    """
    # Accept sigma as scalar, (B,), or (B,1,1,1); canonicalize to (N,1,1,1).
    sigma = jnp.asarray(sigma, dtype=jnp.float32).reshape(-1, 1, 1, 1)
    sd = cfg.sigma_data
    c_skip = sd**2 / (sigma**2 + sd**2)
    c_out = sigma * sd / jnp.sqrt(sigma**2 + sd**2)
    c_in = 1.0 / jnp.sqrt(sd**2 + sigma**2)
    c_noise = jnp.log(sigma.reshape(-1)) / 4.0
    batch_size = x.shape[0]
    if c_noise.shape[0] == 1 and batch_size > 1:
        c_noise = jnp.broadcast_to(c_noise, (batch_size,))

    x_raw = x
    x = x * c_in.astype(x.dtype)
    out_net, unet_probs, unet_raw, vit_probs, vit_raw, scaling_factors, out_gate = hdmoem_apply(
        params["net"], cfg, x, c_noise, text_emb, unet_router_mask, vit_router_mask, zeta,
        transition_point=transition_point, softness=softness, alpha_routing=alpha_routing,
        train=train, key=key,
    )
    # Skip/output recombination always in fp32 (the ODE math depends on it).
    # skip_mode "reference" preserves the reference's non-canonical
    # D = c_skip*(c_in*x) + c_out*F (model_config2.py:440-449) bit-for-bit.
    # That form multiplies the skip by c_skip*c_in -> 1/sigma_data as
    # sigma -> 0, so the sampler ODE has NO stable fixed point at small
    # sigma: below the trained sigma range (lognormal(-1.2, 1.6) leaves
    # sigma <~ 0.01 essentially unvisited) each Heun step amplifies x by
    # ~(2 - sigma_next/sigma) and trajectories measurably explode
    # (std 1.2 -> 158 over the last 5 of 18 Karras steps at
    # sigma_min=0.002; the reference's own checked-in samples show the
    # same saturated divergence). skip_mode "canonical" is the EDM-paper
    # form D = c_skip*x + c_out*F (Karras et al. 2022, Table 1), whose
    # sigma -> 0 limit is D -> x — the fix-not-copy option.
    skip = x.astype(jnp.float32) if cfg.skip_mode == "reference" else x_raw.astype(jnp.float32)
    d_x = c_skip * skip + c_out * out_net.astype(jnp.float32)
    log_var = None
    if return_log_var:
        log_var = mp.mp_conv_apply(
            params["log_var_linear"], mp.mp_fourier_apply(params["log_var_fourier"], c_noise)
        ).reshape(-1, 1, 1, 1)
    return {
        "denoised": d_x,
        "Unet_router_loss": unet_probs,
        "Unet_raw": unet_raw,
        "vit_router_loss": vit_probs,
        "vit_raw": vit_raw,
        "scaling_net_out": scaling_factors,
        "out_gate": out_gate,
        "log_var": log_var,
    }
