"""Optimizer: multi-group AdamW + cosine LR + MP weight projection.

Re-design of the reference optimizer setup (Utils/training.py:55-65) with two
deliberate fixes (SURVEY.md §7 "reference bugs to fix-not-copy"):

- the reference's ``model.net.routers`` param group is an AttributeError as
  written (the attributes are ``Unet_router``/``vit_router``); here routers
  (and config1's ``scaling_net``) form a real group.
- parameters in no group (gates, fourier stacks, input/output projections,
  ``alpha_txt``, the log-var head) silently received no updates in the
  reference; here they train in an ``other`` group.

The EDM2 forced weight normalization (MP_Conv's train-time in-place
``weights.copy_(normalize(w))``, model_internals.py:254-256) becomes a pure
post-update projection: every ``"mpw"`` leaf is re-normalized after the
optimizer step. Forward passes normalize at use, so the composition matches
the reference's semantics without mutation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import optax

from hdmoe_tpu.ops import mp


@dataclass(frozen=True)
class OptimConfig:
    """Reference optimizer surface (Utils/configs.py:42-49) + fixes."""

    lr_vit: float = 2e-3
    lr_unet: float = 5e-4
    lr_attn: float = 1e-3
    lr_router: float = 5e-4
    lr_other: float = 5e-4  # group the reference left untrained
    eta_min: float = 1e-5
    total_schedule_steps: int = 5000
    grad_clip: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    weight_decay: float = 0.01  # torch AdamW default


def label_params(params: Dict[str, Any]):
    """Assign each leaf to an LR group by its top-level module path."""

    group_of = {
        "unet_experts": "unet",
        "vit_experts": "vit",
        "cross_attn": "attn",
        "cross_attn_text": "attn",
        "unet_router": "router",
        "vit_router": "router",
        "scaling_net": "router",
    }

    def label_tree(tree, group):
        return jax.tree_util.tree_map(lambda _: group, tree)

    net = params.get("net", params)
    net_labels = {k: label_tree(v, group_of.get(k, "other")) for k, v in net.items()}
    if "net" in params:
        labels = {k: label_tree(v, "other") for k, v in params.items() if k != "net"}
        labels["net"] = net_labels
        return labels
    return net_labels


def cosine_lr(base_lr: float, cfg: OptimConfig, t, *, xp=None):
    """torch CosineAnnealingLR: eta_min + (base-eta_min)*(1+cos(pi t/T))/2.

    THE single source of the LR math — both the optax schedule (traced, xp=jnp)
    and the host-side telemetry (xp=math) evaluate this same function, so they
    cannot silently diverge (round-1 review finding)."""
    import math

    if xp is None:
        t = min(max(t, 0), cfg.total_schedule_steps)
        cos = math.cos
    else:
        t = xp.clip(t, 0, cfg.total_schedule_steps)
        cos = xp.cos
    cosine = 0.5 * (1.0 + cos(math.pi * t / cfg.total_schedule_steps))
    return cfg.eta_min + (base_lr - cfg.eta_min) * cosine


def _cosine(base_lr: float, cfg: OptimConfig):
    """Optax schedule wrapper over :func:`cosine_lr` (traced with jnp)."""
    if base_lr <= 0:
        return base_lr
    import jax.numpy as jnp

    return lambda step: cosine_lr(base_lr, cfg, step, xp=jnp)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    def group(lr):
        return optax.adamw(_cosine(lr, cfg), b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay)

    tx = optax.multi_transform(
        {
            "unet": group(cfg.lr_unet),
            "vit": group(cfg.lr_vit),
            "attn": group(cfg.lr_attn),
            "router": group(cfg.lr_router),
            "other": group(cfg.lr_other),
        },
        label_params,
    )
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)


def project_mp_weights(params):
    """Re-project every MP weight leaf onto the unit-RMS sphere.

    Applied after each optimizer step; equivalent to the reference's
    train-forward in-place weight renormalization up to O(eps) (the reference
    normalizes pre-update weights inside the forward; both schemes keep stored
    weights on the sphere every step, and the forward normalize-at-use makes
    the compute identical).
    """

    def project(path, leaf):
        if path and getattr(path[-1], "key", None) == "mpw":
            keys = [getattr(p, "key", None) for p in path]
            if "stacked_experts" in keys:
                # stacked banks carry a leading expert axis: per-expert,
                # per-out-channel normalization reduces dims 2..n
                return mp.normalize(leaf, axis=tuple(range(2, leaf.ndim)))
            return mp.normalize(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(project, params)


def current_lrs(cfg: OptimConfig, step) -> Dict[str, float]:
    """LR telemetry for the logger (reference logs param_groups[0]['lr']).

    Evaluates :func:`cosine_lr` with host math (the exact function the optax
    schedule traces) — no device computation in the hot loop, no duplicated
    formula."""
    out = {}
    for name, lr in (
        ("unet", cfg.lr_unet),
        ("vit", cfg.lr_vit),
        ("attn", cfg.lr_attn),
        ("router", cfg.lr_router),
        ("other", cfg.lr_other),
    ):
        out[name] = cosine_lr(lr, cfg, step) if lr > 0 else lr
    return out
