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


def test_gpipe_backward_grads_match_sequential():
    """Reverse-mode AD through the scanned schedule == sequential grads
    (the GPipe backward: reverse ticks, left-rotating cotangents)."""
    n_stages, micro, b, f = 4, 4, 8, 8
    mesh = _mesh(n_stages)
    w = jax.random.normal(jax.random.PRNGKey(1), (n_stages, f, f)) / np.sqrt(f)
    x = jax.random.normal(KEY, (b, f))

    def stage_fn(p, x_):
        return jnp.tanh(x_ @ p)

    def loss_pipe(w_):
        return jnp.sum(gpipe(stage_fn, w_, x, mesh, axis="model", num_microbatches=micro) ** 2)

    def loss_seq(w_):
        h = x
        for i in range(n_stages):
            h = jnp.tanh(h @ w_[i])
        return jnp.sum(h**2)

    g_pipe = jax.grad(loss_pipe)(w)
    g_seq = jax.grad(loss_seq)(w)
    np.testing.assert_allclose(np.asarray(g_pipe), np.asarray(g_seq), atol=1e-5, rtol=1e-5)

    # input grads too
    gx_pipe = jax.grad(lambda x_: jnp.sum(gpipe(stage_fn, w, x_, mesh, axis="model", num_microbatches=micro) ** 2))(x)
    gx_seq = jax.grad(lambda x_: loss_seq_x(w, x_, n_stages))(x)
    np.testing.assert_allclose(np.asarray(gx_pipe), np.asarray(gx_seq), atol=1e-5, rtol=1e-5)


def loss_seq_x(w_, x_, n):
    h = x_
    for i in range(n):
        h = jnp.tanh(h @ w_[i])
    return jnp.sum(h**2)


def _vit_stack(n_stages, emb=16, seq=8):
    """Stacked real ViT (DiffiT) blocks as homogeneous pipeline stages."""
    from hdmoe_tpu.models.components import VitBlockCfg, vit_block_init

    cfg = VitBlockCfg(num_heads=4, num_groups=4, num_channels=emb, seq_ln=seq, emb_dim=emb)
    keys = jax.random.split(jax.random.PRNGKey(3), n_stages)
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *[vit_block_init(k, cfg) for k in keys]
    )
    return cfg, stacked


def test_gpipe_real_vit_block_stack_forward_and_backward():
    """Pipeline the ACTUAL DiffiT ViT blocks (the homogeneous stage candidate
    named in the module docstring): outputs and parameter grads must match
    running the block stack sequentially."""
    from hdmoe_tpu.models.components import vit_block_apply

    n_stages, micro, b, seq, emb = 4, 2, 4, 8, 16
    mesh = _mesh(n_stages)
    cfg, stacked = _vit_stack(n_stages, emb=emb, seq=seq)
    x = jax.random.normal(KEY, (b, seq, emb))

    def stage_fn(p, x_):
        return vit_block_apply(p, cfg, x_)

    out = gpipe(stage_fn, stacked, x, mesh, axis="model", num_microbatches=micro)

    ref = x
    for i in range(n_stages):
        p_i = jax.tree_util.tree_map(lambda l: l[i], stacked)
        ref = vit_block_apply(p_i, cfg, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def loss_pipe(w_):
        return jnp.sum(gpipe(stage_fn, w_, x, mesh, axis="model", num_microbatches=micro) ** 2)

    def loss_seq(w_):
        h = x
        for i in range(n_stages):
            h = vit_block_apply(jax.tree_util.tree_map(lambda l: l[i], w_), cfg, h)
        return jnp.sum(h**2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    flat_p = jax.tree_util.tree_leaves(g_pipe)
    flat_s = jax.tree_util.tree_leaves(g_seq)
    for a, b_ in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5, rtol=3e-5)


def test_gpipe_stage_count_mismatch_raises():
    mesh = _mesh(4)
    w = jnp.ones((3, 1))
    with pytest.raises(AssertionError):
        gpipe(lambda p, x_: x_, w, jnp.ones((4, 2)), mesh, axis="model", num_microbatches=2)


def test_gpipe_batch_axis_composes_dp():
    """batch_axis shards the microbatch batch dim over the data axis: same
    numbers as the replicated form, batch-sharded output sharding, and
    grads still match the sequential loop (PP x DP composition)."""
    n_stages, micro, b, f = 2, 2, 8, 16
    mesh = make_mesh(MeshConfig(data=4, model=n_stages, expert=1),
                     devices=jax.devices()[:8])
    w = jax.random.normal(jax.random.PRNGKey(2), (n_stages, f, f)) / np.sqrt(f)
    x = jax.random.normal(KEY, (b, f))
    aux = jax.random.normal(jax.random.PRNGKey(3), (b, f))

    def stage_fn(p, x_, a_):
        return jnp.tanh(x_ @ p) + 0.1 * a_

    def run(batch_axis):
        def loss(w_, x_):
            out = gpipe(stage_fn, w_, x_, mesh, axis="model",
                        num_microbatches=micro, aux=aux, batch_axis=batch_axis)
            return jnp.sum(out ** 2), out
        (l, out), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(w, x)
        return l, out, g

    l_rep, out_rep, g_rep = run(None)
    l_dp, out_dp, g_dp = run("data")
    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_rep), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(l_dp), float(l_rep), rtol=1e-5)
    # grads: psum-of-shards reassociation drift only
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_rep), rtol=5e-4, atol=5e-6)

    # sequential oracle
    def seq(w_, x_):
        y = x_
        for i in range(n_stages):
            y = stage_fn(w_[i], y, aux)
        return jnp.sum(y ** 2)

    g_seq = jax.grad(seq)(w, x)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_seq), rtol=5e-4, atol=5e-6)
