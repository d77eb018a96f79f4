"""DPM-Solver++(2M) sampler tests with mock denoisers.

Same harness style as tests/test_sampler.py (the reference's
tests/test_utilities/test_sampler.py pattern): analytic oracles on the
probability-flow ODE, convergence vs the Heun solver (both integrate the
SAME ODE, so at fine schedules they must agree), NFE accounting, and the
solver registry contract. The solver itself is a capability extension
beyond the reference sampler (see hdmoe_tpu/sampler/dpm.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.sampler import (
    EDMSamplerConfig,
    dpmpp_2m_sample,
    edm_sample,
    make_sampler,
    solver_nfe,
)

KEY = jax.random.PRNGKey(0)
SHAPE = (2, 8, 8, 4)


def test_constant_denoiser_is_exact_per_step():
    """For denoised == c the PF-ODE solution is x(sigma) = c + (x0-c)*sigma/sigma_max,
    and the lambda-space exponential integrator is EXACT at every step."""
    cfg = EDMSamplerConfig(num_steps=12)
    noise = jax.random.normal(KEY, SHAPE)
    c = 0.7
    from hdmoe_tpu.sampler import karras_sigma_schedule

    t_steps = np.asarray(karras_sigma_schedule(cfg))
    final, traj = dpmpp_2m_sample(
        lambda x, s, t: jnp.full_like(x, c), noise, None, cfg, return_trajectory=True
    )
    x0 = np.asarray(noise) * t_steps[0]
    for i in range(cfg.num_steps):
        analytic = c + (x0 - c) * t_steps[i + 1] / t_steps[0]
        np.testing.assert_allclose(np.asarray(traj[i]), analytic, atol=1e-4,
                                   err_msg=f"step {i}")
    np.testing.assert_allclose(np.asarray(final), np.full(SHAPE, c), atol=1e-5)


def test_zero_denoiser_terminal_zero():
    cfg = EDMSamplerConfig(num_steps=10)
    noise = jax.random.normal(KEY, SHAPE)
    out = dpmpp_2m_sample(lambda x, s, t: jnp.zeros_like(x), noise, None, cfg)
    np.testing.assert_allclose(np.asarray(out), np.zeros(SHAPE), atol=1e-5)


def _nonlinear_denoiser(x, sigma, text):
    """Smooth, bounded, sigma-dependent mock: exercises the multistep path."""
    return jnp.tanh(x) * (1.0 / (1.0 + sigma))


def test_agrees_with_heun_on_same_ode():
    """Both solvers integrate the same ODE: at fine schedules the endpoints
    must coincide; at coarse schedules dpmpp2m must be the one converging
    TOWARD the fine solution (2nd-order consistency sanity)."""
    noise = jax.random.normal(KEY, SHAPE)
    ref = edm_sample(_nonlinear_denoiser, noise, None, EDMSamplerConfig(num_steps=96))
    dpm_fine = dpmpp_2m_sample(_nonlinear_denoiser, noise, None, EDMSamplerConfig(num_steps=192))
    dpm_coarse = dpmpp_2m_sample(_nonlinear_denoiser, noise, None, EDMSamplerConfig(num_steps=24))
    scale = float(jnp.abs(ref).mean()) + 1e-8
    err_fine = float(jnp.abs(dpm_fine - ref).mean()) / scale
    err_coarse = float(jnp.abs(dpm_coarse - ref).mean()) / scale
    assert err_fine < 2e-3, err_fine
    assert err_fine < err_coarse


def test_matched_quality_at_fewer_nfe():
    """The headline property: dpmpp2m at N NFE tracks the fine solution about
    as well as Heun at ~2N NFE (here: 20 vs 19-step Heun = 37 NFE)."""
    noise = jax.random.normal(KEY, SHAPE)
    ref = edm_sample(_nonlinear_denoiser, noise, None, EDMSamplerConfig(num_steps=96))
    heun_37 = edm_sample(_nonlinear_denoiser, noise, None, EDMSamplerConfig(num_steps=19))
    dpm_20 = dpmpp_2m_sample(_nonlinear_denoiser, noise, None, EDMSamplerConfig(num_steps=20))
    err_heun = float(jnp.abs(heun_37 - ref).mean())
    err_dpm = float(jnp.abs(dpm_20 - ref).mean())
    # within 3x of a solver costing ~1.85x the evals (empirically it is close
    # to parity on smooth denoisers; the bound just pins the order)
    assert err_dpm < 3.0 * err_heun + 1e-6, (err_dpm, err_heun)


def test_deterministic_and_key_ignored():
    cfg = EDMSamplerConfig(num_steps=8)
    noise = jax.random.normal(KEY, SHAPE)
    a = dpmpp_2m_sample(_nonlinear_denoiser, noise, None, cfg, key=jax.random.PRNGKey(1))
    b = dpmpp_2m_sample(_nonlinear_denoiser, noise, None, cfg, key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_churn_rejected():
    cfg = EDMSamplerConfig(num_steps=8, s_churn=1.0)
    with pytest.raises(ValueError, match="deterministic"):
        dpmpp_2m_sample(_nonlinear_denoiser, jnp.zeros(SHAPE), None, cfg)


def test_nfe_accounting():
    """dpmpp2m costs exactly num_steps denoiser evaluations (Heun: 2N-1)."""
    calls = {"n": 0}

    def counting(x, s, t):
        calls["n"] += 1
        return jnp.zeros_like(x)

    # count at trace time: one scan body trace = 1 call, so count via an
    # impure python denoiser under lax.scan is not meaningful — instead
    # check the registry's accounting and the trajectory length.
    assert solver_nfe("heun", 18) == 35
    assert solver_nfe("dpmpp2m", 20) == 20
    with pytest.raises(ValueError):
        solver_nfe("ddim", 10)
    cfg = EDMSamplerConfig(num_steps=20)
    _, traj = dpmpp_2m_sample(counting, jnp.zeros(SHAPE), None, cfg, return_trajectory=True)
    assert traj.shape == (20,) + SHAPE


def test_registry():
    assert make_sampler("heun") is edm_sample
    assert make_sampler("dpmpp2m") is dpmpp_2m_sample
    with pytest.raises(ValueError):
        make_sampler("euler")


def test_jittable():
    cfg = EDMSamplerConfig(num_steps=8)
    noise = jax.random.normal(KEY, SHAPE)
    fn = jax.jit(lambda n: dpmpp_2m_sample(_nonlinear_denoiser, n, None, cfg))
    out = fn(noise)
    ref = dpmpp_2m_sample(_nonlinear_denoiser, noise, None, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)
