"""HDMOEM assembly + EDM preconditioning tests.

Mirrors reference tests/test_model/test_preconditioned_model.py with the
corrected (dict-returning) API, plus config1/config2 variant coverage and
jit/grad contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.models import HDMOEMConfig, hdmoem_init, hdmoem_apply, precond_init, precond_apply

KEY = jax.random.PRNGKey(0)


def tiny_cfg(**kw):
    base = dict(
        in_channels=4,
        img_resolution=8,
        internal_channels=8,
        time_emb_dim=16,
        text_emb_dim=12,
        num_experts=2,
        top_k=1,
        fourier_bandwidth=1.0,
        vit_num_blocks=1,
        vit_patch_sizes=(2, 4),
        vit_num_groups=4,
        vit_num_heads=4,
        vit_emb_size=16,
        unet_num_blocks=1,
        unet_channel_mult=(1, 2),
        unet_kernel_sizes=((3, 3), (5, 5)),
        unet_model_channels=8,
        unet_channel_mult_emb=2,
        sigma_data=0.5,
        log_var_channels=8,
    )
    base.update(kw)
    return HDMOEMConfig(**base)


def _inputs(cfg, b=3):
    x = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))
    tv = jax.random.normal(jax.random.PRNGKey(2), (b,)) * 0.5
    txt = jax.random.normal(jax.random.PRNGKey(3), (b, 7, cfg.text_emb_dim))
    mask = jnp.ones((b, cfg.num_experts))
    return x, tv, txt, mask


@pytest.mark.parametrize("variant", ["config1", "config2"])
def test_hdmoem_forward_shapes(variant):
    cfg = tiny_cfg(variant=variant)
    params = hdmoem_init(KEY, cfg)
    x, tv, txt, mask = _inputs(cfg)
    out, up, uraw, vp, vraw, scale, gate = hdmoem_apply(
        params, cfg, x, tv, txt, mask, mask, zeta=0.0
    )
    b = x.shape[0]
    assert out.shape == x.shape
    assert up.shape == uraw.shape == vp.shape == vraw.shape == (b, cfg.num_experts)
    assert scale.shape == (b, 2)
    assert gate.shape == (b, cfg.img_resolution, cfg.img_resolution, 2)
    np.testing.assert_allclose(np.asarray(gate).sum(-1), np.ones((b, 8, 8)), rtol=1e-5)
    # config1 (learned softmax*2) sums to 2.0; config2's analytic schedule
    # sums to (1 + 2*1e-2)*2 = 2.04 (model_config2.py:247-248).
    expected_sum = 2.0 if variant == "config1" else 2.04
    np.testing.assert_allclose(np.asarray(scale).sum(-1), expected_sum * np.ones(b), rtol=1e-4)


def test_config2_scaling_follows_sigmoid_schedule():
    cfg = tiny_cfg()
    params = hdmoem_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    # very low noise -> unet dominant; very high noise -> vit dominant
    low = jnp.full((3,), jnp.log(0.002) / 4)
    high = jnp.full((3,), jnp.log(80.0) / 4)
    *_, scale_low, _ = hdmoem_apply(params, cfg, x, low, txt, mask, mask, 0.0, -1.2, 1.2)
    *_, scale_high, _ = hdmoem_apply(params, cfg, x, high, txt, mask, mask, 0.0, -1.2, 1.2)
    assert float(scale_low[0, 1]) > float(scale_low[0, 0])  # unet > vit at low noise
    assert float(scale_high[0, 0]) > float(scale_high[0, 1])  # vit > unet at high noise


def test_unconditional_text_none():
    cfg = tiny_cfg(text_emb_dim=0)
    params = hdmoem_init(KEY, cfg)
    x, tv, _, mask = _inputs(cfg)
    out, *_ = hdmoem_apply(params, cfg, x, tv, None, mask, mask, 0.0)
    assert out.shape == x.shape


def test_precond_output_dict():
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    sigma = jnp.exp(jax.random.normal(jax.random.PRNGKey(4), (3, 1, 1, 1)))
    out = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0, return_log_var=True)
    assert set(out.keys()) == {
        "denoised", "Unet_router_loss", "Unet_raw", "vit_router_loss", "vit_raw",
        "scaling_net_out", "out_gate", "log_var",
    }
    assert out["denoised"].shape == x.shape
    assert out["log_var"].shape == (3, 1, 1, 1)
    out2 = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0, return_log_var=False)
    assert out2["log_var"] is None


def test_precond_skip_dominates_at_low_sigma():
    """At sigma -> 0: c_skip -> 1, c_in -> 1/sigma_data... reference applies
    skip to c_in*x, so D_x ~ c_skip*c_in*x. Verify against the closed form
    since experts are zero-init (out_gain=0) only the deterministic fusion
    remains; with a freshly-initialized net the denoised output must at least
    be finite and match shape."""
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    sigma = jnp.full((3, 1, 1, 1), 1e-3)
    out = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0)
    assert np.isfinite(np.asarray(out["denoised"])).all()


def test_precond_singleton_sigma_broadcast():
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    sigma = jnp.ones((1, 1, 1, 1)) * 0.7
    out = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0)
    assert out["denoised"].shape == x.shape


def test_precond_jit_and_eval_deterministic():
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    sigma = jnp.full((3, 1, 1, 1), 0.5)

    @jax.jit
    def fwd(p, x_):
        return precond_apply(p, cfg, x_, sigma, txt, mask, mask, 0.0)["denoised"]

    y1 = fwd(params, x)
    y2 = fwd(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_train_mode_stochastic_but_reproducible():
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    sigma = jnp.full((3, 1, 1, 1), 0.5)
    k = jax.random.PRNGKey(42)
    y1 = precond_apply(params, cfg, x, sigma, txt, mask, mask, 1.0, train=True, key=k)
    y2 = precond_apply(params, cfg, x, sigma, txt, mask, mask, 1.0, train=True, key=k)
    y3 = precond_apply(params, cfg, x, sigma, txt, mask, mask, 1.0, train=True, key=jax.random.PRNGKey(43))
    np.testing.assert_array_equal(np.asarray(y1["denoised"]), np.asarray(y2["denoised"]))
    assert not np.allclose(y1["Unet_raw"], y3["Unet_raw"])


def test_grad_flows_through_model():
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    sigma = jnp.full((3, 1, 1, 1), 0.5)

    def loss(p):
        out = precond_apply(p, cfg, x, sigma, txt, mask, mask, 0.0)
        return jnp.mean(out["denoised"] ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    total = sum(float(jnp.abs(l).sum()) for l in flat)
    assert total > 0


def test_capacity_dispatch_variant_runs():
    cfg = tiny_cfg(dispatch="capacity", capacity_factor=2.0)
    params = precond_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    sigma = jnp.full((3, 1, 1, 1), 0.5)
    out = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0)
    assert out["denoised"].shape == x.shape


def test_remat_experts_matches_and_grads():
    """remat_experts must not change values; grads stay finite."""
    from dataclasses import replace

    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    x, _, txt, mask = _inputs(cfg)
    sigma = jnp.full((3, 1, 1, 1), 0.5)
    base = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    rcfg = replace(cfg, remat_experts=True)
    remat = precond_apply(params, rcfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    np.testing.assert_allclose(np.asarray(remat), np.asarray(base), atol=1e-6)

    g = jax.grad(
        lambda p: jnp.mean(precond_apply(p, rcfg, x, sigma, txt, mask, mask, 0.0)["denoised"] ** 2)
    )(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_skip_mode_canonical_vs_reference():
    """skip_mode="canonical" restores the EDM-paper skip D = c_skip*x +
    c_out*F; "reference" keeps the reference's c_skip*(c_in*x). They differ
    by exactly c_skip*(c_in - 1)*x, and canonical's sigma->0 limit is D->x
    (the reference form's is x/sigma_data — the sampler-divergence root
    cause, see precond_apply)."""
    from dataclasses import replace

    cfg = tiny_cfg(text_emb_dim=0)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))
    m = jnp.ones((2, cfg.num_experts))
    for sig in (0.05, 0.5, 5.0):
        sigma = jnp.full((2,), sig)
        d_ref = precond_apply(params, cfg, x, sigma, None, m, m, 0.0)["denoised"]
        d_can = precond_apply(params, replace(cfg, skip_mode="canonical"), x, sigma, None, m, m, 0.0)["denoised"]
        sd = cfg.sigma_data
        c_skip = sd**2 / (sig**2 + sd**2)
        c_in = 1.0 / np.sqrt(sd**2 + sig**2)
        expected_delta = c_skip * (c_in - 1.0) * np.asarray(x)
        np.testing.assert_allclose(np.asarray(d_ref - d_can), expected_delta, atol=1e-5,
                                   err_msg=f"sigma={sig}")
