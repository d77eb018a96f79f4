"""Noise-level (sigma) samplers for EDM training.

Re-design of reference Utils/utils.py:6-61 with explicit PRNG keys. Shapes
are (B, 1, 1, 1) to broadcast over NHWC batches, matching the reference's
NCHW-broadcast shape.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sample_sigma(
    key: jax.Array,
    batch_size: int,
    uniform: bool = False,
    p_mean: float = -0.4,
    p_std: float = 1.0,
    sigma_max: float = 80.0,
    sigma_min: float = 0.002,
) -> jnp.ndarray:
    """Log-uniform or clamped log-normal sigma draw (utils.py:6-24)."""
    if uniform:
        low = math.log(sigma_min)
        high = math.log(sigma_max)
        u = jax.random.uniform(key, (batch_size, 1, 1, 1))
        return jnp.exp(u * (high - low) + low)
    z = jax.random.normal(key, (batch_size, 1, 1, 1))
    sigma = jnp.exp(z * p_std + p_mean)
    return jnp.clip(sigma, sigma_min, sigma_max)


def sample_sigma_hybrid(
    key: jax.Array,
    batch_size: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    p_mean: float = -0.4,
    p_std: float = 1.0,
    extreme_prob: float = 0.2,
) -> jnp.ndarray:
    """Hybrid log-normal core + log-uniform tail sampler (utils.py:26-61).

    ``(1-extreme_prob)`` of the batch is log-normal(p_mean, p_std) ("core"
    EDM2 noise levels) and the rest log-uniform over [sigma_min, sigma_max]
    ("expert coverage"); the combined batch is clamped and shuffled so easy
    and hard samples interleave.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    n_lognormal = int(batch_size * (1.0 - extreme_prob))
    n_uniform = batch_size - n_lognormal
    z = jax.random.normal(k1, (n_lognormal, 1, 1, 1))
    sig_ln = jnp.exp(z * p_std + p_mean)
    u = jax.random.uniform(k2, (n_uniform, 1, 1, 1))
    log_min, log_max = math.log(sigma_min), math.log(sigma_max)
    sig_u = jnp.exp(u * (log_max - log_min) + log_min)
    sigma = jnp.clip(jnp.concatenate([sig_ln, sig_u], axis=0), sigma_min, sigma_max)
    perm = jax.random.permutation(k3, batch_size)
    return sigma[perm]
