"""DPM-Solver++(2M) multistep sampler compiled to ``lax.scan``, TPU-native.

Capability extension beyond the reference (which ships only the 2nd-order
Heun EDM sampler, Utils/EDM_sampler.py:72-109): DPM-Solver++(2M)
(Lu et al. 2022, arXiv:2211.01095) is a 2nd-order *multistep* solver for
the same probability-flow ODE — it reuses the previous step's denoiser
output instead of paying a mid-step corrector evaluation, so a sample
costs **N** denoiser evaluations instead of Heun's **2N-1**. At matched
quality this is a direct ~1.75x NFE (and therefore throughput) win; the
FID-vs-NFE harness quantifies the trade.

TPU design mirrors :mod:`hdmoe_tpu.sampler.edm`: the whole trajectory is
ONE jitted ``lax.scan`` over the Karras sigma schedule (static shapes, no
host sync), and the denoiser contract is the same duck-typed
``denoise_fn(x, sigma, text_emb) -> denoised`` built by
``edm.make_denoiser`` — guidance, folded weights, and the serve/deploy
AOT paths all compose unchanged.

Math (data-prediction / "++" form, exponential integrator in
``lambda = -log sigma`` space, sigma-only EDM parameterization):

  h_i      = lambda_{i+1} - lambda_i                      (> 0)
  r_i      = h_{i-1} / h_i
  D_i      = (1 + 1/(2 r_i)) * denoised_i - 1/(2 r_i) * denoised_{i-1}
  x_{i+1}  = (sigma_{i+1}/sigma_i) * x_i - expm1(-h_i) * D_i

with a first-order (DDIM) step at i=0 (no history yet) and at the
terminal sigma=0 step, where the update collapses to ``x = denoised``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from hdmoe_tpu.sampler.edm import EDMSamplerConfig, karras_sigma_schedule


def solver_nfe(solver: str, num_steps: int) -> int:
    """Denoiser evaluations a full sample costs under each solver."""
    if solver == "heun":
        return 2 * num_steps - 1
    if solver == "dpmpp2m":
        return num_steps
    raise ValueError(f"unknown solver {solver!r} (heun | dpmpp2m)")


def dpmpp_2m_sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray],
    noise: jnp.ndarray,
    text_emb: Optional[jnp.ndarray],
    cfg: EDMSamplerConfig,
    key: Optional[jax.Array] = None,
    return_trajectory: bool = False,
) -> jnp.ndarray:
    """DPM-Solver++(2M) over the Karras schedule as one ``lax.scan``.

    Exactly ``cfg.num_steps`` denoiser evaluations. Deterministic: the
    solver has no churn/ancestral noise, so ``key`` is accepted only for
    signature parity with :func:`hdmoe_tpu.sampler.edm.edm_sample` (the
    serve engine passes one unconditionally) and is unused; ``cfg.s_churn``
    must be 0.

    ``return_trajectory=True`` additionally returns the per-step states
    (num_steps, *x.shape) for convergence/parity tests.
    """
    del key  # deterministic solver
    if cfg.s_churn > 0:
        raise ValueError("dpmpp2m is deterministic; s_churn is Heun-only")
    t_steps = karras_sigma_schedule(cfg)  # (N+1,), terminal 0
    n = cfg.num_steps
    x0 = noise.astype(jnp.float32) * t_steps[0]
    sig_cur = t_steps[:-1]
    sig_next = t_steps[1:]
    # sigma_{i-1} for the multistep ratio; the i=0 entry is a dummy (the
    # first step is forced first-order below, so it never feeds the update).
    sig_prev = jnp.concatenate([t_steps[:1], t_steps[:-2]])

    def body(carry, inputs):
        x, old_d = carry
        i, s_prev, s_cur, s_next = inputs
        denoised = denoise_fn(x, s_cur.reshape(1, 1, 1, 1), text_emb)

        # lambda = -log sigma; clamp the terminal sigma=0 so the log is
        # finite — the selected first-order terminal update does not use it.
        s_next_safe = jnp.maximum(s_next, jnp.float32(1e-20))
        h = jnp.log(s_cur) - jnp.log(s_next_safe)
        h_last = jnp.log(s_prev) - jnp.log(s_cur)

        # First-order (DDIM) step when there is no history (i == 0) or at
        # the terminal step (k-diffusion convention: sigma_next == 0).
        # r is gated through a safe denominator because jnp.where evaluates
        # both branches (h_last == 0 at the dummy i=0 entry -> r = 0 ->
        # 1/(2r) = inf -> inf * 0 = nan without the gate).
        first_order = jnp.logical_or(i == 0, s_next <= 0.0)
        r_safe = jnp.where(first_order, 1.0, h_last / h)
        c = jnp.where(first_order, 0.0, 1.0 / (2.0 * r_safe))
        denoised_d = (1.0 + c) * denoised - c * old_d

        # ratio == exp(-h) computed exactly from the schedule (0 at terminal)
        ratio = s_next / s_cur
        x_next = ratio * x - jnp.expm1(-h) * denoised_d
        return (x_next, denoised), (x_next if return_trajectory else None)

    xs = (jnp.arange(n), sig_prev, sig_cur, sig_next)
    (x_final, _), traj = lax.scan(body, (x0, jnp.zeros_like(x0)), xs,
                                  unroll=max(1, cfg.scan_unroll))
    if return_trajectory:
        return x_final, traj
    return x_final


def make_sampler(solver: str) -> Callable:
    """Solver registry: name -> sample function with the edm_sample signature."""
    from hdmoe_tpu.sampler.edm import edm_sample

    if solver == "heun":
        return edm_sample
    if solver == "dpmpp2m":
        return dpmpp_2m_sample
    raise ValueError(f"unknown solver {solver!r} (heun | dpmpp2m)")
