"""Ring attention vs full attention on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.ops.pallas.flash_attention import _attention_reference
from hdmoe_tpu.ops.ring_attention import ring_attention_local, sequence_parallel_attention
from hdmoe_tpu.parallel import MeshConfig, make_mesh

KEY = jax.random.PRNGKey(0)


def _qkv(b=2, h=2, l=64, d=8):
    ks = jax.random.split(KEY, 3)
    return (
        jax.random.normal(ks[0], (b, h, l, d)),
        jax.random.normal(ks[1], (b, h, l, d)),
        jax.random.normal(ks[2], (b, h, l, d)),
    )


def test_ring_matches_full_attention_8way():
    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    q, k, v = _qkv(l=64)
    out = sequence_parallel_attention(q, k, v, mesh, axis="data")
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_single_device_degenerate():
    mesh = make_mesh(MeshConfig(data=1, model=1, expert=1), devices=jax.devices()[:1])
    q, k, v = _qkv(l=16)
    out = sequence_parallel_attention(q, k, v, mesh, axis="data")
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_extreme_logits_stable():
    mesh = make_mesh(MeshConfig(data=4, model=1, expert=1), devices=jax.devices()[:4])
    q, k, v = _qkv(l=32)
    out = sequence_parallel_attention(q * 25.0, k, v, mesh, axis="data")
    ref = _attention_reference(q * 25.0, k, v, None)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_ring_jits_under_mesh():
    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    q, k, v = _qkv(l=128, d=16)
    f = jax.jit(lambda q_, k_, v_: sequence_parallel_attention(q_, k_, v_, mesh, axis="data"))
    out = f(q, k, v)
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
