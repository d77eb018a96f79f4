"""On-device augmentation pipeline (reference README TODO 3 — open there).

Covers the op semantics (exact mirrors/rotations, bounded translation,
photometric identities), the determinism/identity contracts, and the
train-loop integration on both feed paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.train.augment import AugmentConfig, augment_batch


def _batch(b=4, h=16, w=16, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, 256, size=(b, h, w, c), dtype=np.uint8))


def test_disabled_config_is_identity_passthrough():
    x = _batch()
    cfg = AugmentConfig(hflip=0.0, translate=0.0)
    assert not cfg.enabled
    out = augment_batch(jax.random.PRNGKey(0), x, cfg)
    assert out is x  # no-op: not even a dtype cast


def test_deterministic_per_key_and_jittable():
    x = _batch()
    cfg = AugmentConfig(hflip=0.5, rot90=0.5, translate=0.25,
                        brightness=0.1, contrast=0.2)
    f = jax.jit(lambda k, px: augment_batch(k, px, cfg))
    a = f(jax.random.PRNGKey(3), x)
    b = f(jax.random.PRNGKey(3), x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = f(jax.random.PRNGKey(4), x)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_hflip_certain_is_exact_mirror():
    x = _batch()
    out = augment_batch(jax.random.PRNGKey(0), x,
                        AugmentConfig(hflip=1.0, translate=0.0))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x, dtype=np.float32)[:, :, ::-1, :])


def test_vflip_certain_is_exact_mirror():
    x = _batch()
    out = augment_batch(jax.random.PRNGKey(0), x,
                        AugmentConfig(hflip=0.0, vflip=1.0, translate=0.0))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x, dtype=np.float32)[:, ::-1, :, :])


def test_rot90_certain_yields_true_rotations():
    x = _batch(b=8)
    out = np.asarray(augment_batch(
        jax.random.PRNGKey(1), x,
        AugmentConfig(hflip=0.0, rot90=1.0, translate=0.0)))
    xf = np.asarray(x, dtype=np.float32)
    ks = []
    for i in range(x.shape[0]):
        matches = [k for k in (1, 2, 3)
                   if np.array_equal(out[i], np.rot90(xf[i], k, (0, 1)))]
        assert matches, f"sample {i} is not a 90-degree rotation"
        ks.append(matches[0])
    assert len(set(ks)) > 1  # per-sample k, not one global rotation


def test_translate_content_and_bounds():
    # a delta image makes the shift readable: the hot pixel must move by at
    # most the configured fraction and the output stays edge-padded content
    b, h, w = 6, 16, 16
    x = np.zeros((b, h, w, 3), dtype=np.uint8)
    x[:, h // 2, w // 2, :] = 255
    cfg = AugmentConfig(hflip=0.0, translate=0.25)  # max 4 px at 16
    out = np.asarray(augment_batch(jax.random.PRNGKey(2), jnp.asarray(x), cfg))
    assert out.shape == x.shape
    shifted = 0
    for i in range(b):
        ys, xs, _ = np.nonzero(out[i])
        assert len(ys) > 0
        dy, dx = ys[0] - h // 2, xs[0] - w // 2
        assert abs(dy) <= 4 and abs(dx) <= 4
        shifted += int(dy != 0 or dx != 0)
    assert shifted > 0


def test_photometric_ops_bounded_and_centered():
    x = _batch(b=64)
    cfg = AugmentConfig(hflip=0.0, translate=0.0, brightness=0.1, contrast=0.3)
    out = np.asarray(augment_batch(jax.random.PRNGKey(5), x, cfg))
    assert out.min() >= 0.0 and out.max() <= 255.0
    # per-sample means move, but the batch mean stays near the input's
    # (brightness/contrast draws are centered)
    in_mean = np.asarray(x, dtype=np.float64).mean()
    assert abs(out.mean() - in_mean) < 6.0


def test_train_loop_integration_both_feed_paths(tmp_path):
    """Augmentation runs inside the compiled program on the host-fed AND the
    device-gen path; losses stay finite."""
    from __graft_entry__ import _flagship
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.loss import EDMLossConfig
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    cfg, _ = _flagship(tiny=True)
    mask_cfg = dict(
        unet_attr=[3, 5], vit_attr=[2, 4], p_mean=-1.2, p_std=1.6, BW=0.3,
        max_BW=0.8, min_active=1, step_size=100, strat_band="linear",
        unet_noise_range=[0.0, 0.6], vit_noise_range=[0.4, 1.0],
    )
    aug = AugmentConfig(hflip=0.5, translate=0.125, brightness=0.05)
    for ds in ("synthetic", "synthetic-device"):
        run = RunConfig(
            dataset=ds, data_img_res=64, batch_size=4, total_steps=2,
            save_interval=0, log_interval=1, print_interval=1,
            save_dir=str(tmp_path / f"ckpt_{ds}"),
            log_dir=str(tmp_path / f"logs_{ds}"),
            vae="fake", text_encoder="fake", augment=aug,
        )
        final = training_hdmoe(
            cfg, OptimConfig(total_schedule_steps=2), EDMLossConfig(num_experts=2),
            mask_cfg, zeta_configs, run,
        )
        assert np.isfinite(final["loss"]), (ds, final)


def test_cli_augment_parsing():
    from hdmoe_tpu.__main__ import main  # noqa: F401 — import check only
    import argparse

    # mirror the parser fragment: bare flag -> defaults, k=v overrides
    cfg = AugmentConfig()
    assert cfg.hflip == 0.5 and cfg.translate == 0.125 and cfg.enabled
    kw = {}
    for pair in "hflip=0.9,rot90=0.25".split(","):
        k, _, v = pair.partition("=")
        kw[k.strip()] = float(v)
    cfg2 = AugmentConfig(**kw)
    assert cfg2.hflip == 0.9 and cfg2.rot90 == 0.25
