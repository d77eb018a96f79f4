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


def test_ring_with_rel_pos_bias_matches_dense():
    """The TMSA blocks' learnable rel-pos bias works under ring: rows shard
    with the queries, column blocks are sliced per rotation step."""
    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    b, h, l, d = 2, 2, 64, 8
    q, k, v = _qkv(b=b, h=h, l=l, d=d)
    bias = jax.random.normal(jax.random.PRNGKey(9), (h, l, l))
    out = sequence_parallel_attention(q, k, v, mesh, axis="data", bias=bias)
    ref = _attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_bias_gradients_flow():
    """Bias (a learnable parameter in MP attention) gets exact grads through
    the ring path."""
    mesh = make_mesh(MeshConfig(data=4, model=1, expert=1), devices=jax.devices()[:4])
    b, h, l, d = 1, 2, 32, 8
    q, k, v = _qkv(b=b, h=h, l=l, d=d)
    bias = jax.random.normal(jax.random.PRNGKey(9), (h, l, l)) * 0.1

    g_ring = jax.grad(lambda bb: jnp.sum(sequence_parallel_attention(q, k, v, mesh, axis="data", bias=bb) ** 2))(bias)
    g_ref = jax.grad(lambda bb: jnp.sum(_attention_reference(q, k, v, bb) ** 2))(bias)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), atol=2e-5, rtol=2e-5)


def test_model_attention_impl_ring_matches_dense():
    """Full HDMOEM forward with attention_impl="ring" under an active
    ring_attention_context equals the dense-attention forward (the fusion
    cross-attn rides the ring; indivisible sequences fall back exactly)."""
    from dataclasses import replace

    from hdmoe_tpu.models import precond_apply, precond_init
    from hdmoe_tpu.ops.attention import ring_attention_context
    from tests.test_model import tiny_cfg

    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    b = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (b, 1, 1, 1)))
    txt = jax.random.normal(jax.random.PRNGKey(3), (b, 7, 12))
    mask = jnp.ones((b, cfg.num_experts))

    out_dense = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    ring_cfg = replace(cfg, attention_impl="ring")
    with ring_attention_context(mesh, "data"):
        out_ring = precond_apply(params, ring_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_dense), atol=2e-5, rtol=2e-5)

    # without a context the knob falls back to dense (exact)
    out_noctx = precond_apply(params, ring_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    np.testing.assert_allclose(np.asarray(out_noctx), np.asarray(out_dense), atol=0, rtol=0)


def test_ring_jits_under_mesh():
    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    q, k, v = _qkv(l=128, d=16)
    f = jax.jit(lambda q_, k_, v_: sequence_parallel_attention(q_, k_, v_, mesh, axis="data"))
    out = f(q, k, v)
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
