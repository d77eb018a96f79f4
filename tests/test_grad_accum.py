"""Gradient accumulation (train_step.make_train_step_accum).

Pins the semantics the docstring promises: the optimizer update equals one
plain-step update taken with the MEAN of per-microbatch gradients, each
microbatch drawing its own sigma/noise/mask from the split key. Also covers
the mesh path (accum step under make_sharded_train_step on the 8-device CPU
mesh) and the train_loop wiring (grad_accum knob end-to-end).

The reference has no accumulation (single-GPU fixed batch,
/root/reference/Utils/training.py:114-197); this is new capability, so the
oracle is our own grads_fn, not torch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hdmoe_tpu.models import precond_init
from hdmoe_tpu.train.loss import EDMLossConfig
from hdmoe_tpu.train.optim import OptimConfig, make_optimizer, project_mp_weights
from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
from hdmoe_tpu.train.train_step import (
    TrainConfig,
    TrainState,
    _make_grads_fn,
    init_train_state,
    make_train_step_accum,
)

from tests.test_model import tiny_cfg

KEY = jax.random.PRNGKey(0)


def _build(b=2, accum=2, **cfg_kw):
    cfg = tiny_cfg(**cfg_kw)
    params = precond_init(KEY, cfg)
    loss_cfg = EDMLossConfig(num_experts=cfg.num_experts, unet_bal=0.05,
                             vit_bal=0.1, z_bal=0.005)
    optim_cfg = OptimConfig(total_schedule_steps=100)
    train_cfg = TrainConfig(p_mean=-1.2, p_std=1.6)
    umask = MaskGenerator(expert_attributes=(3.0, 5.0), p_mean=-1.2, p_std=1.6,
                          noise_range=(0.0, 0.6))
    vmask = MaskGenerator(expert_attributes=(2.0, 4.0), p_mean=-1.2, p_std=1.6,
                          noise_range=(0.4, 1.0))
    zeta = ZetaSchedule(total_steps=100, max_zeta=2.0, min_zeta=0.01)
    fns = (cfg, loss_cfg, optim_cfg, train_cfg, umask, vmask, zeta)
    state = init_train_state(params, optim_cfg)
    lat = jax.random.normal(
        jax.random.PRNGKey(1),
        (accum, b, cfg.img_resolution, cfg.img_resolution, cfg.in_channels)) * 0.5
    text = jax.random.normal(jax.random.PRNGKey(2), (b, 7, cfg.text_emb_dim))
    return fns, state, lat, text


def test_accum_equals_mean_of_microbatch_grads():
    """accum step == optimizer update on the arithmetic mean of per-
    microbatch grads computed by the shared grads_fn with the same keys."""
    (cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z), state, lat, text = _build(accum=3)
    step_acc = jax.jit(make_train_step_accum(
        cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z, accum=3))
    key = jax.random.PRNGKey(7)
    new_state, metrics, aux = step_acc(state, lat, text, key)

    # oracle: same grads_fn, same key split, mean, one optimizer update
    grads_fn = _make_grads_fn(cfg, loss_cfg, train_cfg, um, vm, z)
    keys = jax.random.split(key, 3)
    gs, ms = [], []
    for i in range(3):
        g, m, a = jax.jit(grads_fn)(state.params, state.step, lat[i], text, keys[i])
        gs.append(g)
        ms.append(m)
    mean_g = jax.tree_util.tree_map(lambda *x: sum(x) / 3.0, *gs)
    tx = make_optimizer(optim_cfg)
    updates, opt_state = tx.update(mean_g, state.opt_state, state.params)
    want_params = project_mp_weights(optax.apply_updates(state.params, updates))

    flat_got = jax.tree_util.tree_leaves(new_state.params)
    flat_want = jax.tree_util.tree_leaves(want_params)
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5, rtol=2e-5)
    assert int(new_state.step) == int(state.step) + 1

    # metrics are microbatch means (extrema for sigma_min/max)
    np.testing.assert_allclose(
        float(metrics["loss"]), np.mean([float(m["loss"]) for m in ms]), rtol=1e-5)
    assert float(metrics["sigma_max"]) == pytest.approx(
        max(float(m["sigma_max"]) for m in ms), rel=1e-6)
    assert float(metrics["sigma_min"]) == pytest.approx(
        min(float(m["sigma_min"]) for m in ms), rel=1e-6)
    # aux is the LAST microbatch's
    np.testing.assert_allclose(np.asarray(aux["sigma"]), np.asarray(a["sigma"]),
                               rtol=1e-6)


def test_accum_training_makes_progress():
    (cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z), state, lat, text = _build(accum=2)
    step_acc = jax.jit(make_train_step_accum(
        cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z, accum=2), donate_argnums=0)
    # fixed key -> fixed sigma/noise draw -> a FIXED objective, so the loss
    # must go down under optimization (fresh keys per step redraw sigma and
    # make consecutive losses incomparable)
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(6):
        state, metrics, _ = step_acc(state, lat, text, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 6
    assert "grad_norm_total" in metrics and "Unet_experts_grad_norm" in metrics


def test_accum_rejects_bad_stack():
    (cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z), state, lat, text = _build(accum=2)
    step_acc = make_train_step_accum(
        cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z, accum=4)
    with pytest.raises(AssertionError, match="accum=4"):
        step_acc(state, lat, text, jax.random.PRNGKey(0))


def test_accum_under_mesh():
    """Sharded accum step on the 8-device CPU mesh: the (accum, B, ...) stack
    is sharded on the BATCH axis (axis 1), and the result matches the
    single-device accum step bit-for-float."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from hdmoe_tpu.parallel import MeshConfig, make_mesh, make_sharded_train_step, shard_train_state
    from hdmoe_tpu.parallel.sharding import batch_sharding

    (cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z), state, lat, text = _build(
        b=8, accum=2)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    constrain = lambda x: jax.lax.with_sharding_constraint(  # noqa: E731
        x, batch_sharding(mesh, x.ndim))
    step_acc = make_train_step_accum(
        cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z, accum=2, constrain=constrain)
    sharded = make_sharded_train_step(step_acc, mesh, donate_state=False)
    key = jax.random.PRNGKey(11)
    st_m = shard_train_state(init_train_state(state.params, optim_cfg), mesh)
    lat_m = jax.device_put(lat, batch_sharding(mesh, 5, axis=1))
    new_m, met_m, _ = sharded(st_m, lat_m, text, key)

    single = jax.jit(make_train_step_accum(
        cfg, loss_cfg, optim_cfg, train_cfg, um, vm, z, accum=2))
    new_s, met_s, _ = single(state, lat, text, key)
    np.testing.assert_allclose(float(met_m["loss"]), float(met_s["loss"]),
                               rtol=1e-5, atol=1e-6)
    got = jax.tree_util.tree_leaves(new_m.params)
    want = jax.tree_util.tree_leaves(new_s.params)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=3e-5, rtol=3e-5)


_MASK_CFG = dict(
    unet_attr=[3, 5], vit_attr=[2, 4], p_mean=-1.2, p_std=1.6, BW=0.3,
    max_BW=0.8, min_active=1, step_size=100, strat_band="linear",
    unet_noise_range=[0.0, 0.6], vit_noise_range=[0.4, 1.0],
)


def test_train_loop_grad_accum_wiring(tmp_path):
    """RunConfig.grad_accum end-to-end: the loop stacks microbatches, runs,
    checkpoints, and reports scalar metrics."""
    from __graft_entry__ import _flagship
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    cfg, _ = _flagship(tiny=True)
    run = RunConfig(save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
                    run_name="accum_smoke", batch_size=2, total_steps=3,
                    save_interval=0, log_interval=1, data_img_res=64,
                    dataset="synthetic", grad_accum=2, print_interval=1)
    out = training_hdmoe(cfg, OptimConfig(total_schedule_steps=3),
                         EDMLossConfig(num_experts=2), _MASK_CFG, zeta_configs, run)
    assert np.isfinite(out["loss"])


def test_run_config_rejects_accum_combos(tmp_path):
    from __graft_entry__ import _flagship
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    cfg, _ = _flagship(tiny=True)
    base = dict(save_dir=str(tmp_path / "c"), log_dir=str(tmp_path / "l"),
                run_name="x", batch_size=2, total_steps=2, save_interval=0,
                data_img_res=64)
    with pytest.raises(ValueError, match="mutually exclusive"):
        training_hdmoe(cfg, OptimConfig(total_schedule_steps=2),
                       EDMLossConfig(num_experts=2), _MASK_CFG, zeta_configs,
                       RunConfig(grad_accum=2, steps_per_call=2, **base))
    with pytest.raises(ValueError, match="synthetic-device"):
        training_hdmoe(cfg, OptimConfig(total_schedule_steps=2),
                       EDMLossConfig(num_experts=2), _MASK_CFG, zeta_configs,
                       RunConfig(grad_accum=2, dataset="synthetic-device", **base))
