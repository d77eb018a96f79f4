"""Runtime subsystem tests: adapters, data pipeline, logger, checkpoint
resume, and the generation entry."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.adapters import FakeCLIP, FakeVAE
from hdmoe_tpu.obs.logger import Logger
from hdmoe_tpu.train.data import SyntheticDataset, batch_iterator, make_dataset, prefetch_to_device

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# Adapters
# ---------------------------------------------------------------------------


def _structured_images(n=2, res=64):
    from hdmoe_tpu.train.data import SyntheticDataset

    ds = SyntheticDataset(resolution=res, seed=3)
    return np.stack([ds.get(i) for i in range(n)])


def test_fake_vae_contract():
    vae = FakeVAE(target_std=0.5)
    px = _structured_images(2, 64)
    lat = vae.encode(jnp.asarray(px))
    assert lat.shape == (2, 8, 8, 4)
    assert 0.2 < float(lat.std()) < 0.9  # ~target_std for structured content
    # deterministic without key
    np.testing.assert_array_equal(np.asarray(vae.encode(jnp.asarray(px))), np.asarray(lat))
    out = vae.decode(lat)
    assert out.shape == px.shape and out.dtype == np.uint8


def test_fake_vae_roundtrip_correlation():
    vae = FakeVAE()
    px = _structured_images(1, 64)
    rec = np.asarray(vae.decode(vae.encode(jnp.asarray(px)))).astype(np.float32)
    corr = np.corrcoef(px.reshape(-1).astype(np.float32), rec.reshape(-1))[0, 1]
    assert corr > 0.8  # block-mean channels preserve image structure


def test_fake_clip_contract():
    clip = FakeCLIP()
    e = clip.encode_text(["a photo of a flower", "a photo of a flower", "a dog"])
    assert e.shape == (3, 77, 768)
    np.testing.assert_array_equal(np.asarray(e[0]), np.asarray(e[1]))
    assert not np.allclose(np.asarray(e[0]), np.asarray(e[2]))
    assert abs(float(e.std()) - 1.0) < 0.05


# ---------------------------------------------------------------------------
# Data pipeline
# ---------------------------------------------------------------------------


def test_synthetic_dataset_and_iterator():
    ds = make_dataset("synthetic", resolution=32, seed=0)
    img = ds.get(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(ds.get(0), ds.get(0))  # deterministic
    assert not np.array_equal(ds.get(0), ds.get(1))
    it = batch_iterator(ds, batch_size=4, seed=0)
    b1 = next(it)
    assert b1.shape == (4, 32, 32, 3)


def test_device_flowers_batch_matches_host_family():
    """The on-device generator (device_flowers_batch) is the jnp twin of the
    host synthetic_flowers family: same shapes/range, same distributional
    statistics (per-image mean/std over a batch), deterministic in the key,
    distinct across the batch."""
    import jax

    from hdmoe_tpu.train.data import device_flowers_batch

    res, b = 32, 64
    key = jax.random.PRNGKey(0)
    gen = jax.jit(lambda k: device_flowers_batch(k, b, res))
    dev = np.asarray(gen(key))
    assert dev.shape == (b, res, res, 3) and dev.dtype == np.float32
    assert dev.min() >= 0.0 and dev.max() <= 255.0
    np.testing.assert_array_equal(dev, np.asarray(gen(key)))  # key-deterministic
    # jit vs eager agree up to fusion/reassociation fp drift only
    np.testing.assert_allclose(
        dev, np.asarray(device_flowers_batch(key, b, res)), atol=1e-2)
    assert not np.array_equal(dev[0], dev[1])  # batch-varied

    host = np.stack([make_dataset("synthetic", resolution=res, seed=0).get(i)
                     for i in range(b)]).astype(np.float32)
    # distributional match: batch-level mean/std of per-image statistics
    for stat in (lambda x: x.mean(axis=(1, 2, 3)), lambda x: x.std(axis=(1, 2, 3))):
        d, h = stat(dev), stat(host)
        assert abs(d.mean() - h.mean()) < 0.25 * h.mean(), (d.mean(), h.mean())
        assert abs(d.std() - h.std()) < 0.5 * h.std() + 2.0, (d.std(), h.std())


def test_batch_iterator_start_batch_fast_forward():
    """Resume fast-forward: iterator(start_batch=k) yields the same stream as
    consuming k batches first — incl. across epoch boundaries (size 8 / bs 2
    => 4 batches/epoch; skipping 6 lands mid-epoch-2)."""
    ds = SyntheticDataset(resolution=8, size=8, seed=0)
    full = batch_iterator(ds, 2, seed=0)
    ref = [next(full) for _ in range(9)]
    for k in (0, 3, 4, 6):
        it = batch_iterator(ds, 2, seed=0, start_batch=k)
        for j in range(9 - k):
            np.testing.assert_array_equal(next(it), ref[k + j])


def _write_image_folder(root, n=10, res=64):
    from PIL import Image

    rng = np.random.RandomState(0)
    sub = root / "class_a"
    sub.mkdir(parents=True)
    for i in range(n):
        arr = rng.randint(0, 256, (res, res, 3), dtype=np.uint8)
        Image.fromarray(arr).save(sub / f"img_{i:03d}.png")


def test_image_folder_dataset(tmp_path):
    """Real-image path (reference trains on Flowers-102 files;
    torchvision is absent here, so PIL folder scan is the real-data route)."""
    from hdmoe_tpu.train.data import ImageFolderDataset

    _write_image_folder(tmp_path, n=10, res=48)
    ds = ImageFolderDataset(str(tmp_path), resolution=32)
    assert len(ds) == 10
    img = ds.get(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(ds.get(0), ds.get(0))  # deterministic
    it = batch_iterator(ds, 4, seed=0)
    assert next(it).shape == (4, 32, 32, 3)


def test_training_on_real_image_folder(tmp_path):
    """End-to-end training on REAL image files (the reference's Flowers-102
    flow, training.py:226-239): a few steps of the tiny model through
    make_dataset('imagefolder') -> VAE encode -> train step."""
    from dataclasses import replace

    from __graft_entry__ import _flagship
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.loss import EDMLossConfig
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    _write_image_folder(tmp_path / "imgs", n=8, res=64)
    cfg, _ = _flagship(tiny=True)
    run = RunConfig(
        dataset="imagefolder", data_root=str(tmp_path / "imgs"), data_img_res=64,
        batch_size=4, total_steps=3, save_interval=0, log_interval=1,
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        vae="fake", text_encoder="fake", print_interval=1,
    )
    mask_cfg = dict(
        unet_attr=[3, 5], vit_attr=[2, 4], p_mean=-1.2, p_std=1.6, BW=0.3,
        max_BW=0.8, min_active=1, step_size=100, strat_band="linear",
        unet_noise_range=[0.0, 0.6], vit_noise_range=[0.4, 1.0],
    )
    metrics = training_hdmoe(
        cfg, OptimConfig(total_schedule_steps=3), EDMLossConfig(num_experts=2),
        mask_cfg, zeta_configs, run,
    )
    assert np.isfinite(metrics["loss"])


def test_cosine_lr_matches_optax_schedule():
    """Host-telemetry LR and the traced optax schedule come from one function."""
    from hdmoe_tpu.train.optim import OptimConfig, cosine_lr, current_lrs

    cfg = OptimConfig(total_schedule_steps=100)
    for step in (0, 1, 37, 50, 99, 100, 150):
        host = current_lrs(cfg, step)
        traced = float(cosine_lr(cfg.lr_unet, cfg, jnp.asarray(step), xp=jnp))
        assert abs(host["unet"] - traced) < 1e-9


def test_prefetch_to_device():
    ds = SyntheticDataset(resolution=16, size=8)
    it = batch_iterator(ds, 2, seed=0)
    pre = prefetch_to_device(it, size=2)
    b = next(pre)
    assert isinstance(b, jax.Array)
    assert b.shape == (2, 16, 16, 3)


# ---------------------------------------------------------------------------
# Logger
# ---------------------------------------------------------------------------


def test_logger_streams(tmp_path):
    log = Logger(log_dir=str(tmp_path), run_name="t", log_interval=1)
    metrics = {
        "loss": jnp.asarray(1.0), "denoising": jnp.asarray(0.5), "balance": jnp.asarray(0.1),
        "z_loss": jnp.asarray(0.01), "entropy": jnp.asarray(0.0), "pure_loss": jnp.asarray(0.9),
        "zeta": jnp.asarray(2.0), "log_var": jnp.asarray(-0.5), "sigma_mean": jnp.asarray(0.3),
        "Unet_experts_grad_norm": jnp.asarray(0.4), "VIT_experts_grad_norm": jnp.asarray(0.2),
    }
    probs = jnp.full((8, 4), 0.25)
    sigma = jnp.full((8,), 0.3)
    log.log_scaling_gating(jnp.full((8, 2), 1.0), jnp.full((8, 2), 0.5), sigma)
    log.log_training_step(0, metrics, lr=5e-4, p_mean=-1.2, p_std=1.6)
    log.log_router_statistics(0, probs, probs, sigma, p_mean=-1.2, p_std=1.6)
    log.log_gradients(0, metrics)

    main = json.loads((tmp_path / "t_training.jsonl").read_text().splitlines()[0])
    for k in ("loss", "denoising", "balance", "z_loss", "entropy", "pure_loss", "zeta",
              "log_var", "lr", "avg_sigma_percentile", "scaling_vit_mean", "gate_wx",
              "noise_level"):
        assert k in main, k
    router = json.loads((tmp_path / "t_router_stats.jsonl").read_text().splitlines()[0])
    for k in ("unet_entropy", "unet_gini", "unet_max_usage", "unet_min_usage",
              "unet_dead_experts", "unet_usage_std", "unet_expert_usage",
              "vit_entropy", "vit_expert_usage", "avg_sigma_percentile"):
        assert k in router, k
    # balanced 4-expert routing: entropy = ln 4, gini = 0, no dead experts
    np.testing.assert_allclose(router["unet_entropy"], np.log(4.0), rtol=1e-5)
    np.testing.assert_allclose(router["unet_gini"], 0.0, atol=1e-6)
    assert router["unet_dead_experts"] == 0
    grads = json.loads((tmp_path / "t_gradients.jsonl").read_text().splitlines()[0])
    assert grads["Unet_experts_grad_norm"] == pytest.approx(0.4)


def test_logger_interval_averaging(tmp_path):
    log = Logger(log_dir=str(tmp_path), run_name="avg", log_interval=2)
    m = lambda v: {"loss": jnp.asarray(v)}
    log.log_training_step(1, m(1.0), lr=1e-3, p_mean=0.0, p_std=1.0)
    log.log_training_step(2, m(3.0), lr=1e-3, p_mean=0.0, p_std=1.0)
    rec = json.loads((tmp_path / "avg_training.jsonl").read_text().splitlines()[0])
    assert rec["loss"] == pytest.approx(2.0)  # averaged over the interval


# ---------------------------------------------------------------------------
# Checkpoint save / resume
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path):
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import TrainState, init_train_state
    from hdmoe_tpu.models import precond_init
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    state = init_train_state(params, OptimConfig())
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    key = jax.random.PRNGKey(123)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, key, mse=0.42, configs={"model": cfg})
    assert mgr.latest_step() == 7

    fresh = init_train_state(precond_init(jax.random.PRNGKey(9), cfg), OptimConfig())
    restored, rkey, mse = mgr.restore(fresh, jax.random.PRNGKey(0))
    assert int(restored.step) == 7
    assert mse == pytest.approx(0.42)
    np.testing.assert_array_equal(np.asarray(rkey), np.asarray(key))
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert (tmp_path / "ckpt" / "config_7.json").exists()
    mgr.close()


def test_checkpoint_async_save_roundtrip(tmp_path):
    """async_save=True: save() returns with the write possibly in flight;
    donating/overwriting the source buffers immediately after must not
    corrupt the checkpoint, and restore() synchronizes with the write.
    Back-to-back saves (one in-flight write max) retain both steps."""
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state
    from hdmoe_tpu.models import precond_init
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    state = init_train_state(precond_init(KEY, cfg), OptimConfig())
    state = state._replace(step=jnp.asarray(3, jnp.int32))
    expect = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    mgr.save(state, jax.random.PRNGKey(1), mse=0.1)
    # clobber the live params while the write may still be streaming
    state = jax.tree_util.tree_map(lambda x: x * 0.0, state)
    mgr.save(state._replace(step=jnp.asarray(4, jnp.int32)), jax.random.PRNGKey(2), mse=0.2)

    fresh = init_train_state(precond_init(jax.random.PRNGKey(9), cfg), OptimConfig())
    restored, _, mse = mgr.restore(fresh, jax.random.PRNGKey(0), step=3)
    assert int(restored.step) == 3 and mse == pytest.approx(0.1)
    for x, y in zip(expect, jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(x, np.asarray(y))
    restored4, _, _ = mgr.restore(fresh, jax.random.PRNGKey(0), step=4)
    assert float(jax.tree_util.tree_leaves(restored4.params)[0].sum()) == 0.0
    mgr.close()


# ---------------------------------------------------------------------------
# Generation entry
# ---------------------------------------------------------------------------


def test_sample_and_save_end_to_end(tmp_path):
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.sampler.generate import sample_and_save
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    imgs = sample_and_save(
        cfg, params=params, out_dir=str(tmp_path / "gen"), batch_size=2, num_steps=3,
        vae_kind="fake", text_kind="fake",
    )
    assert imgs.shape == (2, 64, 64, 3)  # 8x8 latents -> 8x upsample
    assert (tmp_path / "gen" / "grid_unguided.png").exists()
    assert (tmp_path / "gen" / "sample_0.png").exists()
    assert (tmp_path / "gen" / "sample_1.png").exists()
