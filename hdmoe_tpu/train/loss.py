"""EDM training loss with MoE auxiliary terms, TPU-native.

Re-design of reference Utils/utils.py:67-172 as pure functions returning the
same named-scalar dict. All terms computed in float32 under jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def load_balance(gate_probs: jnp.ndarray, num_experts: int) -> jnp.ndarray:
    """Switch-style load-balance penalty ``E * sum(mean_batch(probs)^2)``
    (utils.py:158-161). Equals exactly 1.0 under perfectly uniform routing."""
    p = gate_probs.mean(axis=0)
    return num_experts * jnp.sum(p**2)


def entropy_loss(probs: jnp.ndarray) -> jnp.ndarray:
    """Negative router entropy (utils.py:163-165); reported, not optimized."""
    return -jnp.mean(jnp.sum(probs * jnp.log(probs + 1e-8), axis=-1))


def router_entropy(probs: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy of the batch-mean routing distribution.

    Same computation as the router-stats stream (obs/logger.py:94-96), so the
    training stream's ``entropy`` and the router-stats ``*_entropy`` agree.
    """
    usage = probs.mean(axis=0)
    norm = usage / (usage.sum() + 1e-10)
    return -jnp.sum(norm * jnp.log(norm + 1e-10))


def z_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """Router z-loss ``mean(logsumexp(logits)^2)`` with the reference's
    stability clamps (utils.py:167-172)."""
    logits = jnp.clip(logits, -50.0, 50.0)
    z = jax.scipy.special.logsumexp(logits, axis=-1) ** 2
    return jnp.mean(jnp.clip(z, max=100.0))


def path_prior_loss(
    scaling_factors: jnp.ndarray,
    sigma: jnp.ndarray,
    transition_sigma: float = 1.0,
    sharpness: float = 2.0,
) -> jnp.ndarray:
    """KL(path distribution || sigma-dependent target) (utils.py:67-102).

    Target prefers ViT (index 0) above ``transition_sigma`` and U-Net below.
    Batch-mean KL with the torch KLDivLoss(reduction='batchmean') convention:
    ``mean_batch(sum target * (log target - log probs))``.
    """
    probs = scaling_factors / 2.0
    log_sigma = jnp.log(sigma.reshape(-1) + 1e-8)
    target_vit = jax.nn.sigmoid((log_sigma - math.log(transition_sigma)) * sharpness)
    target = jnp.stack([target_vit, 1.0 - target_vit], axis=1)
    log_probs = jnp.log(probs + 1e-8)
    kl = target * (jnp.log(target + 1e-10) - log_probs)
    return jnp.sum(kl) / scaling_factors.shape[0]


@dataclass(frozen=True)
class EDMLossConfig:
    """Loss hyperparameters (EDM_LOSS.__init__, utils.py:105-125)."""

    num_experts: int
    sigma_data: float = 0.5
    unet_bal: float = 0.0005
    vit_bal: float = 0.0005
    z_bal: float = 0.0001
    prior_bal: float = 0.001
    transition_sigma: float = 1.0
    sharpness: float = 2.0
    use_path_prior: bool = False  # disabled in the reference (utils.py:145)


def edm_loss(
    cfg: EDMLossConfig,
    x: jnp.ndarray,
    sigma: jnp.ndarray,
    out_model: Dict[str, Optional[jnp.ndarray]],
) -> Dict[str, jnp.ndarray]:
    """Total training loss (EDM_LOSS.__call__, utils.py:127-156).

    - ``pure_loss``: uncertainty-weighted MSE
      ``mean((D-x)^2 / exp(logvar) + logvar)`` with logvar clamped to
      [-10, 10] (plain MSE when log_var is None); clamped at 50. The
      lambda(sigma) weighting is intentionally 1 (commented out in the
      reference, utils.py:134-135).
    - ``denoising``: plain MSE, reporting only.
    - ``balance``: per-router load-balance penalties, clamped.
    - ``z_loss``: z-loss on both routers' raw logits, clamped.
    - ``entropy``: mean of the two routers' usage entropies (fix-not-copy:
      the reference hardwires this metric to 0.0 while the helper sits
      unused, utils.py:154,163-165 — SURVEY.md §7 lists it as a bug).
    - ``loss`` = clamp(pure + z + balance, max=50) (+ optional path prior).
    """
    d = out_model["denoised"].astype(jnp.float32)
    x = x.astype(jnp.float32)
    sq_err = (d - x) ** 2
    if out_model.get("log_var") is None:
        pure = jnp.mean(sq_err)
    else:
        log_var = jnp.clip(out_model["log_var"].astype(jnp.float32), -10.0, 10.0)
        pure = jnp.mean(sq_err / jnp.exp(log_var) + log_var)
    pure = jnp.clip(pure, max=50.0)

    denoising = jnp.mean(sq_err)
    balance = jnp.clip(
        cfg.unet_bal * load_balance(out_model["Unet_router_loss"], cfg.num_experts)
        + cfg.vit_bal * load_balance(out_model["vit_router_loss"], cfg.num_experts),
        max=50.0,
    )
    zl = jnp.clip(
        cfg.z_bal * z_loss(out_model["Unet_raw"]) + cfg.z_bal * z_loss(out_model["vit_raw"]),
        max=50.0,
    )
    total = jnp.clip(pure + zl + balance, max=50.0)
    if cfg.use_path_prior:
        prior = jnp.clip(
            cfg.prior_bal
            * path_prior_loss(out_model["scaling_net_out"], sigma, cfg.transition_sigma, cfg.sharpness),
            max=50.0,
        )
        total = jnp.clip(total + prior, max=50.0)
    return {
        "loss": total,
        "denoising": denoising,
        "balance": balance,
        "z_loss": zl,
        "entropy": 0.5
        * (
            router_entropy(out_model["Unet_router_loss"])
            + router_entropy(out_model["vit_router_loss"])
        ),
        "pure_loss": pure,
    }
