"""End-to-end train step tests: single device and sharded over the virtual
8-device CPU mesh (DP x TP)."""

import jax
import jax.numpy as jnp
import numpy as np

from hdmoe_tpu.models import precond_init
from hdmoe_tpu.parallel import MeshConfig, make_mesh, make_sharded_train_step, shard_train_state
from hdmoe_tpu.train.loss import EDMLossConfig
from hdmoe_tpu.train.optim import OptimConfig, label_params, project_mp_weights
from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
from hdmoe_tpu.train.train_step import TrainConfig, init_train_state, make_train_step

from tests.test_model import tiny_cfg

KEY = jax.random.PRNGKey(0)


def _build(b=4, **cfg_kw):
    cfg = tiny_cfg(**cfg_kw)
    params = precond_init(KEY, cfg)
    loss_cfg = EDMLossConfig(num_experts=cfg.num_experts, unet_bal=0.05, vit_bal=0.1, z_bal=0.005)
    optim_cfg = OptimConfig(total_schedule_steps=100)
    train_cfg = TrainConfig(p_mean=-1.2, p_std=1.6)
    umask = MaskGenerator(expert_attributes=(3.0, 5.0), p_mean=-1.2, p_std=1.6, noise_range=(0.0, 0.6))
    vmask = MaskGenerator(expert_attributes=(2.0, 4.0), p_mean=-1.2, p_std=1.6, noise_range=(0.4, 1.0))
    zeta = ZetaSchedule(total_steps=100, max_zeta=2.0, min_zeta=0.01)
    step_fn = make_train_step(cfg, loss_cfg, optim_cfg, train_cfg, umask, vmask, zeta)
    state = init_train_state(params, optim_cfg)
    latents = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.img_resolution, cfg.img_resolution, cfg.in_channels)) * 0.5
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 7, cfg.text_emb_dim))
    return cfg, step_fn, state, latents, text


def test_label_params_groups():
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    labels = label_params(params)
    assert labels["net"]["unet_experts"][0]["out_gain"] == "unet"
    assert labels["net"]["vit_experts"][0]["pos_emb"] == "vit"
    assert labels["net"]["cross_attn"]["q_proj"]["mpw"] == "attn"
    assert labels["net"]["unet_router"]["linear"]["mpw"] == "router"
    assert labels["net"]["gate1"]["mpw"] == "other"
    assert labels["log_var_linear"]["mpw"] == "other"


def test_project_mp_weights_unit_norm():
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    proj = project_mp_weights(params)
    w = proj["net"]["gate1"]["mpw"]
    rms = np.sqrt(np.mean(np.square(np.asarray(w)), axis=tuple(range(1, w.ndim))))
    np.testing.assert_allclose(rms, np.ones_like(rms), atol=1e-2)
    # non-mpw leaves untouched
    np.testing.assert_array_equal(
        np.asarray(proj["net"]["vit_experts"][0]["pos_emb"]),
        np.asarray(params["net"]["vit_experts"][0]["pos_emb"]),
    )


def test_train_step_reduces_loss_single_device():
    cfg, step_fn, state, latents, text = _build()
    jit_step = jax.jit(step_fn)
    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics, aux = jit_step(state, latents, text, sub)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    # training on a fixed batch must make progress
    assert losses[-1] < losses[0]
    # metric vocabulary for the logger
    for k in ("loss", "denoising", "balance", "z_loss", "entropy", "pure_loss",
              "zeta", "log_var", "grad_norm_total", "Unet_experts_grad_norm"):
        assert k in metrics, k
    assert aux["unet_probs"].shape == (4, cfg.num_experts)


def test_train_step_sharded_matches_metrics_shape():
    mesh = make_mesh(MeshConfig(data=4, model=2, expert=1))
    cfg, step_fn, state, latents, text = _build(b=8)
    state = shard_train_state(state, mesh)
    sharded = make_sharded_train_step(step_fn, mesh, donate_state=False)
    state2, metrics, aux = sharded(state, latents, text, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # params stay sharded after the update
    w = state2.params["net"]["gate1"]["mpw"]
    assert not w.sharding.is_fully_replicated or w.shape[0] % 2 != 0


def test_sharded_step_matches_single_device():
    """DPxTP sharding must not change the math (same PRNG, same batch)."""
    mesh = make_mesh(MeshConfig(data=4, model=2, expert=1))
    cfg, step_fn, state, latents, text = _build(b=8)
    k = jax.random.PRNGKey(5)
    _, m1, _ = jax.jit(step_fn)(state, latents, text, k)
    state_sh = shard_train_state(state, mesh)
    sharded = make_sharded_train_step(step_fn, mesh, donate_state=False)
    _, m2, _ = sharded(state_sh, latents, text, k)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(m1["denoising"]), float(m2["denoising"]), rtol=2e-4)


def test_multistep_matches_sequential_steps():
    """make_train_multistep(K): one scanned dispatch == K sequential
    train_step calls with the same split keys (state, metrics, aux all
    match; metrics/aux are the LAST step's)."""
    from hdmoe_tpu.train.train_step import make_train_multistep

    k = 3
    cfg, step_fn, state, latents, text = _build(b=4)
    lat_k = jnp.stack([latents * (1.0 + 0.1 * i) for i in range(k)])
    key = jax.random.PRNGKey(9)

    # sequential reference (jitted once — eager per-op dispatch of a full
    # train step takes minutes on the 1-CPU host)
    seq_state = state
    keys = jax.random.split(key, k)
    jit_ref = jax.jit(step_fn)
    for i in range(k):
        seq_state, seq_metrics, seq_aux = jit_ref(seq_state, lat_k[i], text, keys[i])

    multi = jax.jit(make_train_multistep(step_fn, k))
    m_state, m_metrics, m_aux = multi(state, lat_k, text, key)

    assert int(m_state.step) == int(seq_state.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(seq_state.params),
                    jax.tree_util.tree_leaves(m_state.params)):
        # jitted-scan vs eager sequential: fp fusion/reassociation drift only
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(float(m_metrics["loss"]), float(seq_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m_aux["sigma"]), np.asarray(seq_aux["sigma"]), rtol=1e-6)


def test_training_loop_device_gen(tmp_path):
    """dataset="synthetic-device": the batch is generated + VAE-encoded
    inside the jitted multi-step program (zero host->device image
    transfer); the loop completes with finite loss."""
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    loss_cfg = EDMLossConfig(num_experts=cfg.num_experts)
    optim_cfg = OptimConfig(total_schedule_steps=6)
    mask_cfg = {
        "unet_attr": [3, 5], "vit_attr": [2, 4], "p_mean": -1.2, "p_std": 1.6,
        "BW": 0.3, "max_BW": 0.8, "min_active": 1, "step_size": 0.1,
        "strat_band": "step", "unet_noise_range": (0.0, 0.6),
        "vit_noise_range": (0.4, 1.0),
    }
    zeta_cfg = {"total_schedule_steps": 6, "max_zeta": 2.0, "min_zeta": 0.01,
                "strategy": "cos", "warmup_ratio": 0.1}
    run = RunConfig(
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        run_name="devgen", batch_size=4, total_steps=6, save_interval=0,
        data_img_res=64, dataset="synthetic-device", vae="fake",
        text_encoder="fake", steps_per_call=3,
    )
    final = training_hdmoe(cfg, optim_cfg, loss_cfg, mask_cfg, zeta_cfg, run)
    assert np.isfinite(final["loss"])


def test_training_loop_device_gen_mesh(tmp_path):
    """synthetic-device over a data mesh: GSPMD partitions the in-program
    generator across the data axis (each device produces its own batch
    shard); K=2 steps per dispatch."""
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    loss_cfg = EDMLossConfig(num_experts=cfg.num_experts)
    optim_cfg = OptimConfig(total_schedule_steps=4)
    mask_cfg = {
        "unet_attr": [3, 5], "vit_attr": [2, 4], "p_mean": -1.2, "p_std": 1.6,
        "BW": 0.3, "max_BW": 0.8, "min_active": 1, "step_size": 0.1,
        "strat_band": "step", "unet_noise_range": (0.0, 0.6),
        "vit_noise_range": (0.4, 1.0),
    }
    zeta_cfg = {"total_schedule_steps": 4, "max_zeta": 2.0, "min_zeta": 0.01,
                "strategy": "cos", "warmup_ratio": 0.1}
    run = RunConfig(
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        run_name="devgen_mesh", batch_size=8, total_steps=4, save_interval=0,
        data_img_res=64, dataset="synthetic-device", vae="fake",
        text_encoder="fake", steps_per_call=2,
        mesh=MeshConfig(data=4, model=2, expert=1),
    )
    final = training_hdmoe(cfg, optim_cfg, loss_cfg, mask_cfg, zeta_cfg, run)
    assert np.isfinite(final["loss"])


def test_training_loop_steps_per_call(tmp_path):
    """training_hdmoe with steps_per_call=4 completes, counts steps right,
    and checkpoints/EMA land at call granularity."""
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    loss_cfg = EDMLossConfig(num_experts=cfg.num_experts)
    optim_cfg = OptimConfig(total_schedule_steps=8)
    mask_cfg = {
        "unet_attr": [3, 5], "vit_attr": [2, 4], "p_mean": -1.2, "p_std": 1.6,
        "BW": 0.3, "max_BW": 0.8, "min_active": 1, "step_size": 0.1,
        "strat_band": "step", "unet_noise_range": (0.0, 0.6),
        "vit_noise_range": (0.4, 1.0),
    }
    zeta_cfg = {"total_schedule_steps": 8, "max_zeta": 2.0, "min_zeta": 0.01,
                "strategy": "cos", "warmup_ratio": 0.1}
    run = RunConfig(
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        run_name="msteps", batch_size=4, total_steps=8, save_interval=0,
        data_img_res=64, dataset="synthetic", vae="fake",
        text_encoder="fake", steps_per_call=4, ema_decay=0.999,
    )
    final = training_hdmoe(cfg, optim_cfg, loss_cfg, mask_cfg, zeta_cfg, run)
    assert np.isfinite(final["loss"])


def test_training_loop_posthoc_ema_snapshots(tmp_path):
    """ema_posthoc_every writes <save_dir>_posthoc.npz; the snapshots
    round-trip through save/load and posthoc_ema synthesizes a weight tree
    with the model's structure (Karras post-hoc EMA, reference TODO 8)."""
    import os

    from hdmoe_tpu.train.ema import load_power_snapshots, posthoc_ema
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    loss_cfg = EDMLossConfig(num_experts=cfg.num_experts)
    optim_cfg = OptimConfig(total_schedule_steps=8)
    mask_cfg = {
        "unet_attr": [3, 5], "vit_attr": [2, 4], "p_mean": -1.2, "p_std": 1.6,
        "BW": 0.3, "max_BW": 0.8, "min_active": 1, "step_size": 0.1,
        "strat_band": "step", "unet_noise_range": (0.0, 0.6),
        "vit_noise_range": (0.4, 1.0),
    }
    zeta_cfg = {"total_schedule_steps": 8, "max_zeta": 2.0, "min_zeta": 0.01,
                "strategy": "cos", "warmup_ratio": 0.1}
    run = RunConfig(
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        run_name="posthoc", batch_size=4, total_steps=8, save_interval=0,
        data_img_res=64, dataset="synthetic", vae="fake",
        text_encoder="fake", ema_posthoc_every=4,
    )
    training_hdmoe(cfg, optim_cfg, loss_cfg, mask_cfg, zeta_cfg, run)
    npz = str(tmp_path / "ckpt") + "_posthoc.npz"
    assert os.path.exists(npz)

    from hdmoe_tpu.models import precond_init

    params_like = precond_init(jax.random.PRNGKey(0), cfg)
    snaps = load_power_snapshots(npz, params_like)
    # 2 gammas x snapshot times {4, final(7)}
    assert len(snaps) == 4
    assert {g for g, _, _ in snaps} == {16.97, 6.94}
    rec = posthoc_ema(snaps, 8, sigma_rel=0.075)
    ref_leaves = jax.tree_util.tree_leaves(params_like)
    rec_leaves = jax.tree_util.tree_leaves(rec)
    assert len(ref_leaves) == len(rec_leaves)
    for a, b in zip(ref_leaves, rec_leaves):
        assert a.shape == np.asarray(b).shape
        assert np.all(np.isfinite(np.asarray(b)))


def test_training_loop_multistep_budget_validation(tmp_path):
    """A step budget off the K lattice is rejected up front: the compiled
    program runs exactly K optimizer steps per dispatch, so a non-multiple
    total would silently overshoot (round-3 review finding)."""
    import pytest

    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    cfg = tiny_cfg()
    run = RunConfig(
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        run_name="bad_k", batch_size=4, total_steps=7, save_interval=0,
        data_img_res=64, dataset="synthetic", vae="fake",
        text_encoder="fake", steps_per_call=3,
    )
    zeta_cfg = {"total_schedule_steps": 7, "max_zeta": 2.0, "min_zeta": 0.01,
                "strategy": "cos", "warmup_ratio": 0.1}
    mask_cfg = {
        "unet_attr": [3, 5], "vit_attr": [2, 4], "p_mean": -1.2, "p_std": 1.6,
        "BW": 0.3, "max_BW": 0.8, "min_active": 1, "step_size": 0.1,
        "strat_band": "step", "unet_noise_range": (0.0, 0.6),
        "vit_noise_range": (0.4, 1.0),
    }
    with pytest.raises(ValueError, match="multiple of"):
        training_hdmoe(cfg, OptimConfig(total_schedule_steps=7),
                       EDMLossConfig(num_experts=cfg.num_experts),
                       mask_cfg, zeta_cfg, run)


def test_training_loop_posthoc_snapshot_time_is_block_end(tmp_path):
    """Under steps_per_call=K the params handed to the trackers have
    completed the whole K-step block, so the recorded profile time must be
    the block END (t=total), not the block start (round-3 review finding:
    a K-1 skew biases every post-hoc reconstruction)."""
    from hdmoe_tpu.train.ema import load_power_snapshots
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    cfg = tiny_cfg()
    mask_cfg = {
        "unet_attr": [3, 5], "vit_attr": [2, 4], "p_mean": -1.2, "p_std": 1.6,
        "BW": 0.3, "max_BW": 0.8, "min_active": 1, "step_size": 0.1,
        "strat_band": "step", "unet_noise_range": (0.0, 0.6),
        "vit_noise_range": (0.4, 1.0),
    }
    zeta_cfg = {"total_schedule_steps": 4, "max_zeta": 2.0, "min_zeta": 0.01,
                "strategy": "cos", "warmup_ratio": 0.1}
    run = RunConfig(
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        run_name="posthoc_k", batch_size=4, total_steps=4, save_interval=0,
        data_img_res=64, dataset="synthetic", vae="fake",
        text_encoder="fake", steps_per_call=2, ema_posthoc_every=2,
    )
    training_hdmoe(cfg, OptimConfig(total_schedule_steps=4),
                   EDMLossConfig(num_experts=cfg.num_experts),
                   mask_cfg, zeta_cfg, run)
    params_like = precond_init(jax.random.PRNGKey(0), cfg)
    snaps = load_power_snapshots(str(tmp_path / "ckpt") + "_posthoc.npz", params_like)
    ts = sorted({t for _, t, _ in snaps})
    assert ts == [4.0], ts  # 4 optimizer steps completed => t = 4
