"""Pallas MoE dispatch/combine kernel tests (interpret mode) vs jnp oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.models.moe_stacked import expert_assignment
from hdmoe_tpu.ops.pallas.moe_kernels import combine_tables, pallas_combine, pallas_dispatch

KEY = jax.random.PRNGKey(0)


def test_pallas_dispatch_matches_gather():
    b, f, e, c = 8, 128, 3, 4
    x = jax.random.normal(KEY, (b, f))
    idx = jax.random.randint(jax.random.PRNGKey(1), (e, c), 0, b)
    out = pallas_dispatch(x, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[idx]))


def _oracle_combine(contributions, slots, weights):
    return jnp.einsum("bk,bkf->bf", weights, contributions[slots])


def test_combine_tables_top1():
    gate = jnp.asarray([[0.9, 0.0], [0.0, 1.0], [0.7, 0.0], [0.0, 0.4]])
    idx, w = expert_assignment(gate, capacity=2)
    slots, cw = combine_tables(idx, w, batch=4, top_k=1)
    # sample 0 -> expert 0 slot 0 (flat 0); sample 2 -> expert 0 slot 1 (flat 1)
    # sample 1 -> expert 1 slot 0 (flat 2); sample 3 -> expert 1 slot 1 (flat 3)
    np.testing.assert_array_equal(np.asarray(slots).reshape(-1), [0, 2, 1, 3])
    np.testing.assert_allclose(np.asarray(cw).reshape(-1), [0.9, 1.0, 0.7, 0.4])


def test_combine_tables_top2_and_drops():
    # sample 0 routed to experts 0 and 2; sample 1 dropped by capacity on expert 0
    gate = jnp.asarray([[0.6, 0.0, 0.4], [0.8, 0.2, 0.0], [0.5, 0.5, 0.0]])
    idx, w = expert_assignment(gate, capacity=1)  # capacity 1: expert 0 keeps only sample 0
    slots, cw = combine_tables(idx, w, batch=3, top_k=2)
    # reconstruct dense combine and compare against a scatter-add oracle
    e, c = idx.shape
    contrib = jax.random.normal(jax.random.PRNGKey(2), (e * c, 16))
    got = _oracle_combine(contrib, slots, cw)
    # scatter-add oracle from the dispatch view
    oracle = jnp.zeros((3, 16))
    for ei in range(e):
        for ci in range(c):
            oracle = oracle.at[idx[ei, ci]].add(contrib[ei * c + ci] * w[ei, ci])
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=1e-6)


def test_pallas_combine_matches_oracle():
    b, k, f = 8, 2, 128
    n = 16
    contrib = jax.random.normal(KEY, (n, f))
    slots = jax.random.randint(jax.random.PRNGKey(3), (b, k), 0, n)
    weights = jax.random.uniform(jax.random.PRNGKey(4), (b, k))
    out = pallas_combine(contrib, slots, weights, interpret=True)
    ref = _oracle_combine(contrib, slots, weights)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_full_pallas_roundtrip_equals_stacked_dispatch():
    """dispatch -> per-expert scale -> combine == moe_dispatch_stacked oracle."""
    from hdmoe_tpu.models.moe_stacked import moe_dispatch_stacked

    b, hw, ch, e = 6, 4, 2, 3
    f = hw * hw * ch
    x = jax.random.normal(KEY, (b, hw, hw, ch))
    gate = jax.nn.one_hot(jnp.asarray([0, 1, 2, 0, 1, 2]), e) * jnp.linspace(0.5, 1.0, b)[:, None]
    cap = 2
    idx, w = expert_assignment(gate, capacity=cap)

    scales = jnp.asarray([1.0, 2.0, 3.0])
    # Pallas path
    xg = pallas_dispatch(x.reshape(b, f), idx, interpret=True).reshape(e, cap, hw, hw, ch)
    out_e = xg * scales[:, None, None, None, None]
    slots, cw = combine_tables(idx, w, batch=b, top_k=1)
    got = pallas_combine(out_e.reshape(e * cap, f), slots, cw, interpret=True).reshape(b, hw, hw, ch)

    # oracle via the jnp stacked dispatch
    def apply_fn(p, xx, tt, txt, *, train=False, key=None):
        return xx * p["s"]

    ref = moe_dispatch_stacked(
        x, {"s": scales}, apply_fn, gate, jnp.zeros((b, 3)), None, capacity=cap
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
