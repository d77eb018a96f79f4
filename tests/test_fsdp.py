"""ZeRO/FSDP parameter + optimizer-state sharding (parallel/sharding.py).

The reference is single-device torch with no distributed layer (SURVEY.md
§2.7), so the oracle is our own replicated-mesh step: FSDP must change ONLY
the storage layout — same loss, same updated parameters — while params and
their Adam moments are stored 1/data-sized per device and the returned state
stays in that layout (no replicated round-trip after the update).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from hdmoe_tpu.models import precond_init
from hdmoe_tpu.parallel import (
    MeshConfig,
    make_mesh,
    make_sharded_train_step,
    shard_train_state,
)
from hdmoe_tpu.parallel.sharding import param_shardings
from hdmoe_tpu.train.loss import EDMLossConfig
from hdmoe_tpu.train.optim import OptimConfig
from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
from hdmoe_tpu.train.train_step import TrainConfig, init_train_state, make_train_step

from tests.test_model import tiny_cfg

KEY = jax.random.PRNGKey(0)


def _spec_of(shardings, *path):
    node = shardings
    for k in path:
        node = node[k]
    return node.spec


def test_fsdp_spec_rules():
    """Largest still-unsharded divisible dim gets "data"; small leaves and
    indivisible leaves replicate; composes with the TP "model" rule."""
    params = {
        "conv": {"mpw": jnp.ones((16, 8, 3, 3))},      # 1152 elems
        "wide": {"mpw": jnp.ones((6, 24))},            # dim0 indivisible by 8
        "tiny": {"bias": jnp.ones((8,))},              # below min_size
        "odd": {"scale": jnp.ones((3, 5))},            # nothing divisible
    }
    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    sh = param_shardings(params, mesh, fsdp=True, fsdp_min_size=64)
    assert _spec_of(sh, "conv", "mpw") == P("data", None, None, None)
    assert _spec_of(sh, "wide", "mpw") == P(None, "data")
    assert _spec_of(sh, "tiny", "bias") == P()
    assert _spec_of(sh, "odd", "scale") == P()

    # TP takes dim 0 of mpw; FSDP then moves to the next-largest free dim.
    tp_mesh = make_mesh(MeshConfig(data=4, model=2, expert=1))
    sh_tp = param_shardings(params, tp_mesh, fsdp=True, fsdp_min_size=64)
    assert _spec_of(sh_tp, "conv", "mpw") == P("model", "data", None, None)

    # fsdp=False keeps the old behavior exactly.
    sh_off = param_shardings(params, mesh, fsdp=False)
    assert _spec_of(sh_off, "conv", "mpw") == P()

    # composes with EP: a stacked bank keeps its expert axis and FSDP moves
    # to the next-largest free divisible dim.
    ep_mesh = make_mesh(MeshConfig(data=2, model=1, expert=4))
    bank = {"class_banks": {"w": {"mpw": jnp.ones((4, 32, 8))}}}
    sh_ep = param_shardings(bank, ep_mesh, fsdp=True, fsdp_min_size=64)
    assert _spec_of(sh_ep, "class_banks", "w", "mpw") == P("expert", "data", None)


def _build_step(cfg):
    loss_cfg = EDMLossConfig(num_experts=cfg.num_experts, unet_bal=0.05,
                             vit_bal=0.1, z_bal=0.005)
    optim_cfg = OptimConfig(total_schedule_steps=100)
    train_cfg = TrainConfig(p_mean=-1.2, p_std=1.6)
    umask = MaskGenerator(expert_attributes=(3.0, 5.0), p_mean=-1.2, p_std=1.6,
                          noise_range=(0.0, 0.6))
    vmask = MaskGenerator(expert_attributes=(2.0, 4.0), p_mean=-1.2, p_std=1.6,
                          noise_range=(0.4, 1.0))
    zeta = ZetaSchedule(total_steps=100, max_zeta=2.0, min_zeta=0.01)
    return make_train_step(cfg, loss_cfg, optim_cfg, train_cfg, umask, vmask,
                           zeta), optim_cfg


def test_fsdp_step_matches_replicated():
    """One sharded train step, FSDP storage vs replicated storage: identical
    loss and updated parameters (layout-only change), and the returned FSDP
    state KEEPS its 1/data-sized shards."""
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    step_fn, optim_cfg = _build_step(cfg)
    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))

    b = 8
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (b, cfg.img_resolution, cfg.img_resolution,
                             cfg.in_channels)) * 0.5
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 7, cfg.text_emb_dim))
    key = jax.random.PRNGKey(3)

    rep_state = shard_train_state(init_train_state(params, optim_cfg), mesh)
    rep_step = make_sharded_train_step(step_fn, mesh, donate_state=False)
    rep_new, rep_metrics, _ = rep_step(rep_state, lat, text, key)

    fs_state = shard_train_state(init_train_state(params, optim_cfg), mesh,
                                 fsdp=True, fsdp_min_size=16)
    fs_shardings = jax.tree_util.tree_map(lambda x: x.sharding, fs_state)
    fs_step = make_sharded_train_step(step_fn, mesh, donate_state=False,
                                      state_shardings=fs_shardings)
    fs_new, fs_metrics, _ = fs_step(fs_state, lat, text, key)

    np.testing.assert_allclose(float(fs_metrics["loss"]),
                               float(rep_metrics["loss"]), rtol=1e-5)
    for (pa, a), (pb, b_) in zip(
            jax.tree_util.tree_leaves_with_path(rep_new.params),
            jax.tree_util.tree_leaves_with_path(fs_new.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa))

    # layout preserved through the update (no replicated round-trip)
    want_shards = [x.sharding for x in jax.tree_util.tree_leaves(fs_state.params)]
    got_leaves = jax.tree_util.tree_leaves(fs_new.params)
    for leaf, want in zip(got_leaves, want_shards):
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (
            leaf.sharding, want)
    assert any("data" in tuple(w.spec) for w in want_shards), \
        "nothing was FSDP-sharded"


def test_fsdp_shards_params_and_moments():
    """Storage really is 1/data-sized: every data-sharded param leaf keeps
    exactly size/8 elements per device, and the Adam moments follow."""
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    _, optim_cfg = _build_step(cfg)
    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    state = shard_train_state(init_train_state(params, optim_cfg), mesh,
                              fsdp=True, fsdp_min_size=16)

    n_sharded = 0
    for leaf in jax.tree_util.tree_leaves(state.params):
        if "data" in tuple(leaf.sharding.spec):
            assert leaf.addressable_shards[0].data.size == leaf.size // 8
            n_sharded += 1
    assert n_sharded >= 10, f"only {n_sharded} param leaves FSDP-sharded"

    moment_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(leaf, "sharding") and "data" in tuple(leaf.sharding.spec))
    assert moment_sharded >= n_sharded, (
        f"{moment_sharded} opt-state leaves sharded vs {n_sharded} params "
        "(mu AND nu should both follow the param layout)")


def test_checkpoint_restores_into_fsdp_shards(tmp_path):
    """Resume never materializes the full model on one host: with a sharded
    template, orbax restores each leaf straight into its FSDP layout, values
    bit-equal to what was saved."""
    from hdmoe_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    _, optim_cfg = _build_step(cfg)
    state = init_train_state(params, optim_cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, jax.random.PRNGKey(0), mse=0.125)
    mgr.close()

    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    template = shard_train_state(init_train_state(params, optim_cfg), mesh,
                                 fsdp=True, fsdp_min_size=16)
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored, _, mse = mgr2.restore(template, jax.random.PRNGKey(0))
    mgr2.close()
    assert mse == pytest.approx(0.125)

    n_data = 0
    for got, tmpl in zip(jax.tree_util.tree_leaves(restored.params),
                         jax.tree_util.tree_leaves(template.params)):
        assert got.sharding.is_equivalent_to(tmpl.sharding, got.ndim)
        n_data += "data" in tuple(tmpl.sharding.spec)
    assert n_data >= 10, f"only {n_data} restored leaves are FSDP-sharded"

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_mesh_fsdp_flags(monkeypatch):
    """`train --mesh 4,2 --fsdp` parses into RunConfig.mesh/fsdp."""
    import hdmoe_tpu.train.train_loop as tl
    from hdmoe_tpu.__main__ import main

    captured = {}

    def fake_training(model, optim, loss, mask, zeta, run):
        captured["run"] = run
        return {"loss": 0.0}

    monkeypatch.setattr(tl, "training_hdmoe", fake_training)
    main(["train", "heterogeneous_config2", "--steps", "1",
          "--mesh", "4,2", "--fsdp"])
    run = captured["run"]
    assert run.mesh == MeshConfig(data=4, model=2, expert=1)
    assert run.fsdp is True


def test_training_loop_fsdp(tmp_path):
    """End-to-end: training_hdmoe with fsdp=True over the 8-device mesh
    completes with finite loss (the RunConfig knob path)."""
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    cfg = tiny_cfg()
    loss_cfg = EDMLossConfig(num_experts=cfg.num_experts)
    optim_cfg = OptimConfig(total_schedule_steps=2)
    mask_cfg = {
        "unet_attr": [3, 5], "vit_attr": [2, 4], "p_mean": -1.2, "p_std": 1.6,
        "BW": 0.3, "max_BW": 0.8, "min_active": 1, "step_size": 0.1,
        "strat_band": "step", "unet_noise_range": (0.0, 0.6),
        "vit_noise_range": (0.4, 1.0),
    }
    zeta_cfg = {"total_schedule_steps": 2, "max_zeta": 2.0, "min_zeta": 0.01,
                "strategy": "cos", "warmup_ratio": 0.1}
    run = RunConfig(
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        run_name="fsdp", batch_size=8, total_steps=2, save_interval=0,
        data_img_res=64, dataset="synthetic", vae="fake", text_encoder="fake",
        mesh=MeshConfig(data=8, model=1, expert=1), fsdp=True,
        fsdp_min_size=16,
    )
    final = training_hdmoe(cfg, optim_cfg, loss_cfg, mask_cfg, zeta_cfg, run)
    assert np.isfinite(final["loss"])
