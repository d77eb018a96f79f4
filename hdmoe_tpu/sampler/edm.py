"""EDM 2nd-order Heun sampler compiled to ``lax.scan``, TPU-native.

Re-design of reference Utils/EDM_sampler.py:6-109. The host-side Python step
loop becomes a single jitted ``lax.scan`` over the sigma schedule, so a full
sample is one XLA executable (the reference pays 2N-1 separate model launches
plus host sync per step). Classifier-free guidance and stochastic churn are
preserved; churn noise consumes an explicit PRNG key.

The denoiser contract is duck-typed like the reference's (a callable
returning the preconditioned output dict): build one with ``make_denoiser``
from any ``precond_apply``-style function, or pass a custom/mock callable
``denoise_fn(x, sigma, text_emb) -> denoised`` for testing (mirrors the
reference MockDenoiser pattern, tests/test_utilities/test_sampler.py:6-23).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class EDMSamplerConfig:
    """Sampler hyperparameters (EDM_Sampler.__init__, EDM_sampler.py:7-32)."""

    num_steps: int = 32
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    s_churn: float = 0.0
    s_min: float = 0.0
    s_max: float = float("inf")
    s_noise: float = 1.0
    guidance: float = 1.0
    # lax.scan unroll factor: >1 lets XLA software-pipeline across Heun
    # steps (overlapping one step's epilogue with the next's prologue —
    # the 8-11%% IDLE chase, PERF.md "Remaining headroom"). Compile time
    # and program size grow with the factor; Heun results are bit-identical,
    # DPM++(2M) matches to float tolerance (fusion reassociation).
    scan_unroll: int = 1


def karras_sigma_schedule(cfg: EDMSamplerConfig) -> jnp.ndarray:
    """Karras rho-schedule with terminal zero (EDM_sampler.py:82-88):
    ``t_i = (smax^(1/rho) + i/(N-1)*(smin^(1/rho)-smax^(1/rho)))^rho``.
    """
    i = jnp.arange(cfg.num_steps, dtype=jnp.float32)
    a = cfg.sigma_max ** (1.0 / cfg.rho)
    b = cfg.sigma_min ** (1.0 / cfg.rho)
    t = (a + i / (cfg.num_steps - 1) * (b - a)) ** cfg.rho
    return jnp.concatenate([t, jnp.zeros((1,), dtype=jnp.float32)])


def make_denoiser(
    precond_fn: Callable[..., dict],
    num_experts: int,
    transition_point: float,
    softness: float,
    guidance: float = 1.0,
    guide_fn: Optional[Callable[..., dict]] = None,
    uncond_text_emb: Optional[jnp.ndarray] = None,
):
    """Wrap a preconditioned model into the sampler's denoise contract
    (EDM_Sampler.denoise, EDM_sampler.py:34-70).

    Builds all-ones router masks, zeta=0, optional CFG:
    ``out = lerp(ref, cond, guidance)`` against ``guide_fn`` (defaults to the
    same model with ``uncond_text_emb``).
    """

    def denoise(x: jnp.ndarray, sigma: jnp.ndarray, text_emb: Optional[jnp.ndarray]) -> jnp.ndarray:
        bs = x.shape[0]
        ones_mask = jnp.ones((bs, num_experts), dtype=jnp.float32)
        out = precond_fn(
            x, sigma, text_emb, ones_mask, ones_mask, 0.0,
            transition_point=transition_point, softness=softness,
        )
        d_x = out["denoised"]
        if guidance == 1.0:
            return d_x
        g = guide_fn if guide_fn is not None else precond_fn
        emb = uncond_text_emb if uncond_text_emb is not None else text_emb
        ref = g(
            x, sigma, emb, ones_mask, ones_mask, 0.0,
            transition_point=transition_point, softness=softness,
        )["denoised"]
        return ref + (d_x - ref) * guidance

    return denoise


def edm_sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray],
    noise: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    cfg: EDMSamplerConfig,
    key: Optional[jax.Array] = None,
    return_trajectory: bool = False,
) -> jnp.ndarray:
    """Heun sampling loop as one ``lax.scan`` (EDM_Sampler.sample,
    EDM_sampler.py:72-109).

    Per step: optional churn renoise (gamma in [s_min, s_max] band), Euler
    predictor, and a 2nd-order trapezoidal corrector on all but the last
    step. Exactly 2N-1 denoiser evaluations, matching the reference NFE.
    ``key`` is only needed when ``s_churn > 0``. The Heun update keeps the
    reference's exact fp32 op order (``0.5*d_cur + 0.5*d_prime``,
    EDM_sampler.py:107) so trajectories are comparable at float precision.

    ``return_trajectory=True`` additionally returns the per-step states
    (num_steps, *x.shape) — x after each Heun step — for the bit-grade
    trajectory parity harness.
    """
    t_steps = karras_sigma_schedule(cfg)
    x0 = noise.astype(jnp.float32) * t_steps[0]
    n = cfg.num_steps
    if key is None:
        key = jax.random.PRNGKey(0)
    step_keys = jax.random.split(key, n)
    gamma_cap = min(cfg.s_churn / n, math.sqrt(2.0) - 1.0)

    def body(x_cur, inputs):
        i, t_cur, t_next, k = inputs
        if cfg.s_churn > 0:
            in_band = jnp.logical_and(t_cur >= cfg.s_min, t_cur <= cfg.s_max)
            gamma = jnp.where(in_band, gamma_cap, 0.0)
            t_hat = t_cur + gamma * t_cur
            extra_var = jnp.maximum(t_hat**2 - t_cur**2, 0.0)
            # Gate on gamma > 0: float rounding can make t_hat^2 - t_cur^2
            # spuriously nonzero when gamma == 0, which would leak PRNG noise
            # into the nominally deterministic path.
            noise = jnp.where(
                gamma > 0.0, jnp.sqrt(extra_var) * cfg.s_noise * jax.random.normal(k, x_cur.shape), 0.0
            )
            x_hat = x_cur + noise
        else:
            t_hat = t_cur
            x_hat = x_cur

        denoised = denoise_fn(x_hat, t_hat.reshape(1, 1, 1, 1), text_emb)
        d_cur = (x_hat - denoised) / t_hat
        x_euler = x_hat + (t_next - t_hat) * d_cur

        def correct(x_e):
            denoised_p = denoise_fn(x_e, t_next.reshape(1, 1, 1, 1), text_emb)
            d_prime = (x_e - denoised_p) / t_next
            return x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)

        x_next = lax.cond(i < n - 1, correct, lambda x_e: x_e, x_euler)
        return x_next, (x_next if return_trajectory else None)

    xs = (jnp.arange(n), t_steps[:-1], t_steps[1:], step_keys)
    x_final, traj = lax.scan(body, x0, xs, unroll=max(1, cfg.scan_unroll))
    if return_trajectory:
        return x_final, traj
    return x_final
