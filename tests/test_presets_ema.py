"""Preset builders, EMA, and pixel-space (IdentityVAE) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hdmoe_tpu.adapters.vae import IdentityVAE, make_vae
from hdmoe_tpu.train import presets
from hdmoe_tpu.train.ema import EmaTracker, ema_update, warmup_decay


def test_identity_vae_roundtrip():
    vae = make_vae("none", target_std=0.5)
    assert isinstance(vae, IdentityVAE)
    px = (np.random.RandomState(0).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    lat = vae.encode(jnp.asarray(px))
    assert lat.shape == px.shape
    rec = np.asarray(vae.decode(lat))
    np.testing.assert_allclose(rec, px, atol=1.0)  # exact up to uint8 rounding


def test_all_presets_build():
    for name in ("cifar10_pixel_config1", "heterogeneous_config2", "text_guided_64",
                 "latent_256_clip", "moedit_64expert_ep"):
        model, optim, loss, mask, run = getattr(presets, name)(total_steps=10)
        assert loss.num_experts == model.num_experts
        assert len(mask["unet_attr"]) == model.num_experts
    m1, *_ = presets.cifar10_pixel_config1()
    assert m1.variant == "config1" and m1.text_emb_dim == 0 and m1.in_channels == 3
    m5, *_ = presets.moedit_64expert_ep()
    assert m5.num_experts == 64 and m5.expert_sharing == "class_banks" and m5.top_k == 2
    # heterogeneity survives EP scale: two shape classes per path
    assert len(set(m5.unet_kernel_sizes)) == 2 and len(set(m5.vit_patch_sizes)) == 2


def test_preset_model_init_and_forward_cifar():
    from hdmoe_tpu.models import precond_init, precond_apply
    from dataclasses import replace

    model, *_ = presets.cifar10_pixel_config1()
    # shrink for test speed, keep structure (config1, pixel space, no text)
    model = replace(model, img_resolution=8, internal_channels=8, time_emb_dim=16,
                    num_experts=2, vit_patch_sizes=(2, 4), vit_emb_size=16,
                    vit_num_blocks=1, vit_num_heads=4, unet_num_blocks=1,
                    unet_model_channels=8, unet_kernel_sizes=((3, 3), (5, 5)),
                    log_var_channels=8)
    params = precond_init(jax.random.PRNGKey(0), model)
    assert "scaling_net" in params["net"]  # config1 variant
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    sigma = jnp.full((2, 1, 1, 1), 0.5)
    mask = jnp.ones((2, 2))
    out = precond_apply(params, model, x, sigma, None, mask, mask, 0.0)
    assert out["denoised"].shape == x.shape


def test_ema_update_math():
    ema = {"w": jnp.ones(4)}
    params = {"w": jnp.zeros(4)}
    out = ema_update(ema, params, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9 * np.ones(4), rtol=1e-6)


def test_ema_warmup():
    assert warmup_decay(0.9999, 0) == 1.0 / 10.0
    assert warmup_decay(0.9999, 10**7) == 0.9999


def test_ema_tracker_converges_to_params():
    tracker = EmaTracker({"w": jnp.zeros(3)}, decay=0.5)
    target = {"w": jnp.ones(3)}
    for step in range(50):
        tracker.update(target, step)
    np.testing.assert_allclose(np.asarray(tracker.ema_params["w"]), np.ones(3), atol=1e-3)


def test_bfloat16_forward_close_to_f32():
    from dataclasses import replace
    from hdmoe_tpu.models import precond_init, precond_apply
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    sigma = jnp.full((2, 1, 1, 1), 0.5)
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 12))
    mask = jnp.ones((2, 2))
    f32 = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    bf16 = precond_apply(params, replace(cfg, compute_dtype="bfloat16"), x, sigma, txt, mask, mask, 0.0)["denoised"]
    assert bf16.dtype == jnp.float32  # ODE recombination stays fp32
    # bf16 activations: close but not identical
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32), atol=0.1, rtol=0.25)
    assert not np.array_equal(np.asarray(bf16), np.asarray(f32))


# ---- post-hoc EMA (Karras/EDM2; reference README TODO 8) -------------------


def test_sigma_rel_to_gamma_paper_values():
    from hdmoe_tpu.train.ema import sigma_rel_to_gamma

    np.testing.assert_allclose(sigma_rel_to_gamma(0.05), 16.97, atol=0.01)
    np.testing.assert_allclose(sigma_rel_to_gamma(0.10), 6.94, atol=0.01)
    # the conversion inverts the profile's analytic relative-std formula
    for g in (5.0, 10.0, 20.0):
        sr = np.sqrt((g + 1) / ((g + 2) ** 2 * (g + 3)))
        np.testing.assert_allclose(sigma_rel_to_gamma(sr), g, rtol=1e-6)


def test_power_ema_profile_shape():
    """The tracked average weights step t proportionally to ~t^gamma: a
    linear-ramp trajectory's power EMA lands at the profile's analytic
    mean E[t]/T = (gamma+1)/(gamma+2)."""
    from hdmoe_tpu.train.ema import PowerEmaTracker

    T, g = 512, 9.0
    tr = PowerEmaTracker({"w": np.float64(0.0)}, gammas=(g,))
    for step in range(T):
        tr.update({"w": np.float64((step + 1) / T)}, step)
    got = float(np.asarray(tr.emas[g]["w"]))
    np.testing.assert_allclose(got, (g + 1) / (g + 2), rtol=2e-2)


def test_posthoc_ema_reconstructs_untracked_profile():
    """Snapshots of two tracked profiles (sigma_rel 0.05/0.10) synthesize a
    NEVER-TRACKED third profile (0.075) to ~1e-4 relative — the point of
    post-hoc EMA: pick the averaging length after training."""
    from hdmoe_tpu.train.ema import PowerEmaTracker, posthoc_ema, sigma_rel_to_gamma

    T = 1024
    rng = np.random.default_rng(0)
    traj = np.cumsum(rng.normal(size=T))
    tracked = PowerEmaTracker({"w": np.float64(0.0), "b": np.float64(1.0)},
                              gammas=(16.97, 6.94))
    g_target = sigma_rel_to_gamma(0.075)
    oracle = PowerEmaTracker({"w": np.float64(0.0), "b": np.float64(1.0)},
                             gammas=(g_target,))
    for step in range(T):
        p = {"w": np.float64(traj[step]), "b": np.float64(2.0 * traj[step] + 1.0)}
        tracked.update(p, step)
        oracle.update(p, step)
        if (step + 1) % 64 == 0:
            tracked.snapshot(step)
    rec = posthoc_ema(tracked.snapshots, T, sigma_rel=0.075)
    scale = np.abs(traj).mean()
    for k in ("w", "b"):
        want = float(np.asarray(oracle.emas[g_target][k]))
        assert abs(float(rec[k]) - want) / scale < 1e-3, (k, float(rec[k]), want)


def test_posthoc_ema_exact_on_spanned_profile():
    """A target that IS one of the snapshot profiles at its snapshot time
    reconstructs to machine precision (the lsq solution is x = e_i)."""
    from hdmoe_tpu.train.ema import PowerEmaTracker, posthoc_ema

    T = 256
    rng = np.random.default_rng(1)
    tr = PowerEmaTracker({"w": np.float64(0.0)}, gammas=(16.97, 6.94))
    for step in range(T):
        tr.update({"w": np.float64(rng.normal())}, step)
    tr.snapshot(T - 1)
    rec = posthoc_ema(tr.snapshots, T, gamma=6.94)
    want = float(np.asarray(tr.emas[6.94]["w"]))
    np.testing.assert_allclose(float(rec["w"]), want, rtol=1e-9)
