"""Primitive-layer tests.

Mirrors the reference test strategy (tests/test_model/test_internals.py):
statistical variance invariants for MP ops, shape contracts, and golden-value
oracles computed by hand.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.ops import mp


def test_normalize_unit_rms():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64)) * 7.0
    y = mp.normalize(x)
    rms = jnp.sqrt(jnp.mean(y**2, axis=1))
    np.testing.assert_allclose(rms, np.ones(4), atol=1e-2)


def test_normalize_golden():
    # divisor = eps + L2norm/sqrt(N); for x = ones(1, 4): norm=2, N=4 -> divisor ~ 1
    x = jnp.ones((1, 4))
    y = mp.normalize(x, eps=0.0)
    np.testing.assert_allclose(y, np.ones((1, 4)), atol=1e-6)


def test_normalize_axis_subset():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    y = mp.normalize(x, axis=[-1])
    rms = jnp.sqrt(jnp.mean(y**2, axis=-1))
    np.testing.assert_allclose(rms, np.ones((2, 8, 8)), atol=1e-2)


def test_mp_silu_variance():
    x = jax.random.normal(jax.random.PRNGKey(2), (100_000,))
    y = mp.mp_silu(x)
    assert abs(float(y.std()) - 1.0) < 0.1


def test_mp_sum_variance_and_golden():
    key = jax.random.PRNGKey(3)
    a, b = jax.random.normal(key, (2, 100_000))
    y = mp.mp_sum(a, b, 0.3)
    assert abs(float(y.std()) - 1.0) < 0.1
    # golden: a=1, b=3, t=0.5 -> lerp=2, denom=sqrt(0.5) -> 2*sqrt(2)
    np.testing.assert_allclose(
        mp.mp_sum(jnp.array(1.0), jnp.array(3.0), 0.5), 2.0 * np.sqrt(2.0), rtol=1e-6
    )


def test_mp_cat_variance_and_shape():
    key = jax.random.PRNGKey(4)
    a = jax.random.normal(key, (4, 1000, 32))
    b = jax.random.normal(jax.random.PRNGKey(5), (4, 1000, 64))
    y = mp.mp_cat(a, b, axis=-1, t=0.5)
    assert y.shape == (4, 1000, 96)
    assert abs(float(y.std()) - 1.0) < 0.1


def test_resample_down_is_mean_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = mp.resample(x, "down")
    expected = np.array([[2.5, 4.5], [10.5, 12.5]]).reshape(1, 2, 2, 1)
    np.testing.assert_allclose(y, expected)


def test_resample_up_is_nearest_repeat():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = mp.resample(x, "up")
    expected = np.array(
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]], dtype=np.float32
    ).reshape(1, 4, 4, 1)
    np.testing.assert_allclose(y, expected)


def test_resample_roundtrip_keep():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 3))
    assert mp.resample(x, "keep") is x
    np.testing.assert_allclose(mp.resample(mp.resample(x, "up"), "down"), x, atol=1e-6)


def test_pixel_shuffle_matches_torch_ordering():
    # in[b, h, w, c*r*r + i*r + j] -> out[b, h*r+i, w*r+j, c]
    r = 2
    x = jnp.arange(8.0).reshape(1, 1, 1, 8)  # c=2, r=2
    y = mp.pixel_shuffle(x, r)
    assert y.shape == (1, 2, 2, 2)
    # channel 0 block: values 0..3 laid out row-major over (i, j)
    np.testing.assert_allclose(y[0, :, :, 0], [[0, 1], [2, 3]])
    np.testing.assert_allclose(y[0, :, :, 1], [[4, 5], [6, 7]])


def test_mp_fourier_shapes_and_stats():
    params = mp.mp_fourier_init(jax.random.PRNGKey(7), 256, bandwidth=1.0)
    x = jax.random.normal(jax.random.PRNGKey(8), (64,))
    y = mp.mp_fourier_apply(params, x)
    assert y.shape == (64, 256)
    assert abs(float(y.std()) - 1.0) < 0.1  # sqrt(2)*cos(U) has unit variance
    assert float(jnp.abs(y).max()) <= np.sqrt(2) + 1e-5


def test_mp_conv_linear_variance():
    params = mp.mp_conv_init(jax.random.PRNGKey(9), 128, 256)
    x = jax.random.normal(jax.random.PRNGKey(10), (512, 128))
    y = mp.mp_conv_apply(params, x)
    assert y.shape == (512, 256)
    assert abs(float(y.std()) - 1.0) < 0.1


def test_mp_conv_gain_scales_output():
    params = mp.mp_conv_init(jax.random.PRNGKey(11), 16, 16)
    x = jax.random.normal(jax.random.PRNGKey(12), (8, 16))
    y1 = mp.mp_conv_apply(params, x, gain=1.0)
    y2 = mp.mp_conv_apply(params, x, gain=2.0)
    np.testing.assert_allclose(y2, 2.0 * y1, rtol=1e-5)
    y0 = mp.mp_conv_apply(params, x, gain=0.0)
    np.testing.assert_allclose(y0, np.zeros_like(y0), atol=1e-7)


def test_mp_conv_2d_same_padding():
    params = mp.mp_conv_init(jax.random.PRNGKey(13), 3, 8, (3, 3))
    x = jax.random.normal(jax.random.PRNGKey(14), (2, 16, 16, 3))
    y = mp.mp_conv_apply(params, x)
    assert y.shape == (2, 16, 16, 8)
    # even kernel: asymmetric same padding keeps spatial size
    params4 = mp.mp_conv_init(jax.random.PRNGKey(15), 3, 8, (4, 4))
    y4 = mp.mp_conv_apply(params4, x)
    assert y4.shape == (2, 16, 16, 8)
    # non-square input
    xr = jax.random.normal(jax.random.PRNGKey(16), (2, 8, 24, 3))
    assert mp.mp_conv_apply(params, xr).shape == (2, 8, 24, 8)


def test_mp_conv_conv_variance():
    params = mp.mp_conv_init(jax.random.PRNGKey(17), 32, 32, (3, 3))
    x = jax.random.normal(jax.random.PRNGKey(18), (4, 32, 32, 32))
    y = mp.mp_conv_apply(params, x)
    assert abs(float(y.std()) - 1.0) < 0.1


def test_group_norm_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    b, c, h, w = 2, 8, 4, 4
    x = np.random.RandomState(0).randn(b, c, h, w).astype(np.float32)
    ref = torch.nn.functional.group_norm(torch.from_numpy(x), 2, eps=1e-5).numpy()
    params = mp.group_norm_init(c)
    got = mp.group_norm_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), num_groups=2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_group_norm_2d_input():
    x = jax.random.normal(jax.random.PRNGKey(19), (4, 12))
    params = mp.group_norm_init(12)
    y = mp.group_norm_apply(params, x, num_groups=1)
    np.testing.assert_allclose(y.mean(axis=1), np.zeros(4), atol=1e-5)
    np.testing.assert_allclose(y.std(axis=1), np.ones(4), atol=1e-2)


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(1).randn(3, 7, 16).astype(np.float32)
    ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (16,), eps=1e-5).numpy()
    got = mp.layer_norm_apply(mp.layer_norm_init(16), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_dropout_train_eval():
    x = jnp.ones((1000,))
    y_eval = mp.dropout(x, 0.5, jax.random.PRNGKey(20), train=False)
    assert (y_eval == x).all()
    y_train = mp.dropout(x, 0.5, jax.random.PRNGKey(20), train=True)
    kept = float((y_train > 0).mean())
    assert 0.4 < kept < 0.6
    assert float(y_train.max()) == 2.0  # inverted scaling


def test_pos_encoding_shapes():
    params = mp.pos_encoding_init(jax.random.PRNGKey(21), emb_dim=64, freq_emb_dim=32)
    y = mp.pos_encoding_apply(params, jnp.arange(5.0))
    assert y.shape == (5, 64)


def test_conv_layout_im2col_t_matches_xla():
    """conv_layout("im2col_t") is numerically the same conv (transposed
    im2col matmul lowering — MXU-lane optimization, PERF.md)."""
    rs = np.random.RandomState(3)
    for (cin, cout, k, stride, hw) in [
        (32, 32, 3, 1, 16), (64, 32, 5, 1, 8), (4, 32, 3, 1, 16),
        (32, 4, 3, 1, 16), (32, 64, 4, 2, 16), (16, 16, 1, 1, 8),
    ]:
        params = mp.mp_conv_init(jax.random.PRNGKey(k + cin), cin, cout, (k, k))
        x = jnp.asarray(rs.randn(2, hw, hw, cin).astype(np.float32))
        ref = mp.mp_conv_apply(params, x, gain=1.3, stride=stride)
        with mp.conv_layout("im2col_t"):
            got = mp.mp_conv_apply(params, x, gain=1.3, stride=stride)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                                   err_msg=f"cin={cin} cout={cout} k={k} s={stride}")


def test_conv_layout_pallas_matches_xla_and_grads():
    """conv_layout("pallas") — VMEM-im2col kernel (interpret mode on CPU):
    values match the XLA conv; grads are exact (custom_vjp routes the
    backward through the XLA conv's own VJP). Unsupported shapes (stride 2,
    even kernels) silently fall back to the XLA path."""
    rs = np.random.RandomState(5)
    for (cin, cout, k, hw) in [(32, 16, 3, 32), (16, 8, 5, 16), (4, 32, 3, 32)]:
        params = mp.mp_conv_init(jax.random.PRNGKey(k * cin), cin, cout, (k, k))
        x = jnp.asarray(rs.randn(2, hw, hw, cin).astype(np.float32))
        ref = mp.mp_conv_apply(params, x, gain=0.7)
        with mp.conv_layout("pallas"):
            got = mp.mp_conv_apply(params, x, gain=0.7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                                   err_msg=f"cin={cin} cout={cout} k={k}")

        def loss(p, impl):
            with mp.conv_layout(impl):
                return jnp.sum(mp.mp_conv_apply(p, x, gain=0.7) ** 2)

        g_ref = jax.grad(loss)(params, "xla")["mpw"]
        g_pal = jax.grad(loss)(params, "pallas")["mpw"]
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=2e-4, rtol=2e-4)

    # fallback shapes keep working under the context
    p2 = mp.mp_conv_init(jax.random.PRNGKey(0), 8, 8, (4, 4))
    x2 = jnp.asarray(rs.randn(2, 8, 8, 8).astype(np.float32))
    with mp.conv_layout("pallas"):
        out2 = mp.mp_conv_apply(p2, x2, stride=2)
    assert out2.shape == (2, 5, 5, 8)  # stride-2 k//2 'same': floor((8+4-4)/2)+1


def test_mp_conv_silu_fused_matches_unfused():
    """mp_conv_silu_apply: the silu(+scale) prologue fused into the Pallas
    conv == the unfused ops, values and grads, with and without scale."""
    rs = np.random.RandomState(11)
    params = mp.mp_conv_init(jax.random.PRNGKey(2), 16, 16, (3, 3))
    x = jnp.asarray(rs.randn(2, 32, 32, 16).astype(np.float32))
    emb = jnp.asarray(1.0 + 0.1 * rs.randn(2, 16).astype(np.float32))
    for scale in (None, emb):
        ref = mp.mp_conv_silu_apply(params, x, gain=1.1, scale=scale)
        # identical to hand-composed ops
        xs = x if scale is None else x * scale[:, None, None, :]
        np.testing.assert_allclose(
            np.asarray(mp.mp_conv_apply(params, mp.mp_silu(xs), gain=1.1)),
            np.asarray(ref), atol=1e-6)
        with mp.conv_layout("pallas"):
            got = mp.mp_conv_silu_apply(params, x, gain=1.1, scale=scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

        def loss(p, impl, s=scale):
            with mp.conv_layout(impl):
                return jnp.sum(mp.mp_conv_silu_apply(p, x, gain=1.1, scale=s) ** 2)

        g_ref = jax.grad(loss)(params, "xla")["mpw"]
        g_pal = jax.grad(loss)(params, "pallas")["mpw"]
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=2e-4, rtol=2e-4)
