"""Staggered sampler: trajectory parity with the lockstep sampler.

The staggered sampler's correctness claim is that each slot's trajectory is
THE SAME computation as a lockstep run fed the same noise — only the batch
composition changes. Under dense dispatch the model is per-sample
independent, so slot i's round-2 image must match ``edm_sample`` run on the
noise row that slot was re-seeded with.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.sampler.edm import EDMSamplerConfig, edm_sample, make_denoiser
from hdmoe_tpu.sampler.staggered import (
    StaggeredEngine,
    make_staggered_round,
    staggered_init_state,
    staggered_offsets,
)
from tests.test_model import tiny_cfg


def _mock_denoiser(x, sigma, text_emb):
    # Per-sample, sigma-dependent, smooth — enough to exercise the Heun math.
    return x * (sigma / (1.0 + sigma)) + 0.1 * jnp.tanh(x)


def _expected_reset_iteration(i, offsets, n):
    """Slot i re-seeds when (it + o_i) % n == 0; the image in round 2's
    buffer (its 2..2n-1 window) came from the reset at it = n - o_i for
    o_i > 0, or it = n for o_i == 0."""
    o = int(offsets[i])
    return n if o == 0 else n - o


@pytest.mark.parametrize("batch,n", [(4, 6), (3, 5)])
def test_staggered_matches_lockstep_mock(batch, n):
    cfg = EDMSamplerConfig(num_steps=n, sigma_min=0.01, sigma_max=10.0)
    key = jax.random.PRNGKey(7)
    shape = (batch, 4, 4, 2)
    round_fn = jax.jit(make_staggered_round(_mock_denoiser, cfg, batch))

    state = staggered_init_state(batch, shape[1:])
    state, _ = round_fn(state, jnp.int32(0), None, key)  # warm-up
    state, images = round_fn(state, jnp.int32(n), None, key)

    offsets = staggered_offsets(batch, n)
    for i in range(batch):
        it_reset = _expected_reset_iteration(i, offsets, n)
        noise_full = jax.random.normal(jax.random.fold_in(key, it_reset), shape)
        ref = edm_sample(_mock_denoiser, noise_full[i : i + 1], None, cfg)
        np.testing.assert_allclose(
            np.asarray(images[i]), np.asarray(ref[0]), rtol=2e-6, atol=2e-6
        )


def test_staggered_engine_real_model_dense():
    """Slot trajectories through the REAL tiny HDMOEM (dense dispatch) match
    lockstep sampling of the same noise rows."""
    from functools import partial

    from hdmoe_tpu.models import precond_apply, precond_init
    from hdmoe_tpu.train.optim import project_mp_weights

    cfg = tiny_cfg(dispatch="dense")
    params = project_mp_weights(precond_init(jax.random.PRNGKey(0), cfg))
    n, batch = 4, 4
    scfg = EDMSamplerConfig(num_steps=n)
    key = jax.random.PRNGKey(3)
    text = jnp.zeros((batch, 7, cfg.text_emb_dim), jnp.float32)

    den = make_denoiser(partial(precond_apply, params, cfg), cfg.num_experts, -1.2, 1.6)
    round_fn = jax.jit(make_staggered_round(den, scfg, batch))
    shape = (batch, cfg.img_resolution, cfg.img_resolution, cfg.in_channels)
    state = staggered_init_state(batch, shape[1:])
    state, _ = round_fn(state, jnp.int32(0), text, key)
    state, images = round_fn(state, jnp.int32(n), text, key)

    offsets = staggered_offsets(batch, n)
    for i in (0, batch - 1):
        it_reset = _expected_reset_iteration(i, offsets, n)
        noise_full = jax.random.normal(jax.random.fold_in(key, it_reset), shape)
        den1 = make_denoiser(
            partial(precond_apply, params, cfg), cfg.num_experts, -1.2, 1.6
        )
        ref = edm_sample(den1, noise_full[i : i + 1], text[i : i + 1], scfg)
        np.testing.assert_allclose(
            np.asarray(images[i]), np.asarray(ref[0]), rtol=5e-5, atol=5e-5
        )


def test_staggered_engine_stream():
    """Engine API: rounds return fresh, finite, distinct latents; capacity
    dispatch with mixed-sigma batches compiles and runs."""
    from hdmoe_tpu.models import precond_init

    cfg = tiny_cfg(dispatch="einsum", capacity_factor=1.0,
                   capacity_policy="priority")
    params = precond_init(jax.random.PRNGKey(0), cfg)
    eng = StaggeredEngine(cfg, params, batch=4, num_steps=3)
    eng.set_prompts(["x"], seed=5)
    a = np.asarray(eng.sample_round())
    b = np.asarray(eng.sample_round())
    assert a.shape == (4, cfg.img_resolution, cfg.img_resolution, cfg.in_channels)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b)  # fresh noise each trajectory


def test_staggered_dpm_matches_lockstep():
    """DPM++(2M) staggered: slot trajectories (with cross-round multistep
    history) match the lockstep dpmpp_2m_sample fed the same noise."""
    from hdmoe_tpu.sampler.dpm import dpmpp_2m_sample

    batch, n = 4, 6
    cfg = EDMSamplerConfig(num_steps=n, sigma_min=0.01, sigma_max=10.0)
    key = jax.random.PRNGKey(9)
    shape = (batch, 4, 4, 2)
    round_fn = jax.jit(make_staggered_round(_mock_denoiser, cfg, batch,
                                            solver="dpmpp2m"))
    state = staggered_init_state(batch, shape[1:], solver="dpmpp2m")
    state, _ = round_fn(state, jnp.int32(0), None, key)  # warm-up
    state, images = round_fn(state, jnp.int32(n), None, key)

    offsets = staggered_offsets(batch, n)
    for i in range(batch):
        it_reset = _expected_reset_iteration(i, offsets, n)
        noise_full = jax.random.normal(jax.random.fold_in(key, it_reset), shape)
        ref = dpmpp_2m_sample(_mock_denoiser, noise_full[i : i + 1], None, cfg)
        np.testing.assert_allclose(
            np.asarray(images[i]), np.asarray(ref[0]), rtol=2e-5, atol=2e-5
        )
