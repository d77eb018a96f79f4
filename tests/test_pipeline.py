"""GPipe pipeline-parallel tests on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.parallel import MeshConfig, make_mesh
from hdmoe_tpu.parallel.pipeline import gpipe

KEY = jax.random.PRNGKey(0)


def _mesh(n):
    return make_mesh(MeshConfig(data=1, model=n, expert=1), devices=jax.devices()[:n])


def test_gpipe_matches_sequential_scales():
    n_stages, micro, b, f = 4, 4, 8, 16
    mesh = _mesh(n_stages)
    scales = jnp.arange(2.0, 2.0 + n_stages)[:, None]  # (S, 1)
    x = jax.random.normal(KEY, (b, f))

    def stage_fn(p, x_):
        return x_ * p[0]

    out = gpipe(stage_fn, scales, x, mesh, axis="model", num_microbatches=micro)
    ref = x * jnp.prod(scales)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_gpipe_linear_stages():
    n_stages, micro, b, f = 8, 2, 4, 8
    mesh = _mesh(n_stages)
    w = jax.random.normal(jax.random.PRNGKey(1), (n_stages, f, f)) / np.sqrt(f)
    x = jax.random.normal(KEY, (b, f))

    def stage_fn(p, x_):
        return jnp.tanh(x_ @ p)

    out = gpipe(stage_fn, w, x, mesh, axis="model", num_microbatches=micro)
    ref = x
    for i in range(n_stages):
        ref = jnp.tanh(ref @ w[i])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_gpipe_micro_equals_batch():
    mesh = _mesh(2)
    w = jnp.asarray([[2.0], [3.0]])
    x = jax.random.normal(KEY, (6, 4))
    out = gpipe(lambda p, x_: x_ * p[0], w, x, mesh, axis="model", num_microbatches=6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x * 6.0), rtol=1e-5)


def test_gpipe_stage_count_mismatch_raises():
    mesh = _mesh(4)
    w = jnp.ones((3, 1))
    with pytest.raises(AssertionError):
        gpipe(lambda p, x_: x_, w, jnp.ones((4, 2)), mesh, axis="model", num_microbatches=2)
