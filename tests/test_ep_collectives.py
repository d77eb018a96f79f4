"""Expert-parallel collective-pattern verification (round-2 VERDICT item 7).

Two claims are load-bearing for the 64-expert stretch config:

1. the explicit all-to-all dispatch (parallel/ep.py) is numerically
   equivalent to the stacked-bank dispatch;
2. its compiled HLO actually contains ``all-to-all`` collectives and does
   NOT all-gather the expert weight banks — which is what plain GSPMD does
   with the gather-based dispatch (documented below as a regression probe).
"""

import re
from dataclasses import replace as dc_replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hdmoe_tpu.models.moe_stacked import moe_dispatch_stacked, stacked_expert_init
from hdmoe_tpu.parallel import MeshConfig, make_mesh
from hdmoe_tpu.parallel.ep import all_to_all_moe_dispatch, ep_context

KEY = jax.random.PRNGKey(0)
B, H, W, C, E = 16, 4, 4, 3, 4


def _setup():
    mesh = make_mesh(MeshConfig(data=2, model=1, expert=4))
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jax.random.normal(jax.random.PRNGKey(1), (B, 6))
    gate = jax.nn.one_hot(jnp.arange(B) % E, E) * jnp.linspace(0.5, 1.5, B)[:, None]

    def init_one(k):
        return {"s": jax.random.normal(k, ()), "w": jax.random.normal(k, (6,))}

    stacked = stacked_expert_init(jax.random.PRNGKey(5), E, init_one)

    def apply_fn(p, xx, tt, txt, *, train=False, key=None):
        return xx * p["s"] + (tt @ p["w"])[:, None, None, None] * 0.01

    return mesh, x, t, gate, stacked, apply_fn


def test_a2a_dispatch_matches_stacked():
    """all_to_all EP == single-device stacked dispatch at full capacity
    (no drops); gate-weighted outputs identical across the mesh."""
    mesh, x, t, gate, stacked, apply_fn = _setup()
    ref = moe_dispatch_stacked(x, stacked, apply_fn, gate, t, None, capacity=B)
    out = all_to_all_moe_dispatch(
        x, stacked, apply_fn, gate, t, None, mesh, capacity=B
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_a2a_dispatch_grads_match():
    mesh, x, t, gate, stacked, apply_fn = _setup()

    def loss_ref(p):
        return jnp.sum(moe_dispatch_stacked(x, p, apply_fn, gate, t, None, capacity=B) ** 2)

    def loss_a2a(p):
        return jnp.sum(all_to_all_moe_dispatch(x, p, apply_fn, gate, t, None, mesh, capacity=B) ** 2)

    g_ref = jax.grad(loss_ref)(stacked)
    g_a2a = jax.grad(loss_a2a)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_a2a), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_a2a_hlo_contains_all_to_all_and_no_bank_gather():
    """The compiled HLO of the a2a dispatch must contain all-to-all ops; the
    expert banks must NOT be all-gathered (each device keeps E_local)."""
    mesh, x, t, gate, stacked, apply_fn = _setup()
    f = jax.jit(
        lambda x_, p_, g_, t_: all_to_all_moe_dispatch(
            x_, p_, apply_fn, g_, t_, None, mesh, capacity=B
        )
    )
    hlo = f.lower(x, stacked, gate, t).compile().as_text()
    assert len(re.findall(r"all-to-all", hlo)) >= 2, "dispatch+combine all-to-alls missing"
    # weight banks stay local: no all-gather should produce a full (E, 6) bank
    for line in re.findall(r".*all-gather.*", hlo):
        assert f"f32[{E},6]" not in line, f"expert bank all-gathered: {line}"


def test_gspmd_stacked_dispatch_gathers_banks_probe():
    """Regression probe documenting WHY parallel/ep.py exists: the plain
    GSPMD lowering of the gather-based stacked dispatch emits NO all-to-all
    (XLA all-gathers operands instead). If this ever changes (XLA learns the
    pattern), the probe fails loudly and ep.py can be revisited."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh, x, t, gate, stacked, apply_fn = _setup()
    shard_p = jax.tree_util.tree_map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P("expert", *([None] * (l.ndim - 1))))),
        stacked,
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    f = jax.jit(lambda x_, p_, g_, t_: moe_dispatch_stacked(x_, p_, apply_fn, g_, t_, None, capacity=B))
    hlo = f.lower(xs, shard_p, gate, t).compile().as_text()
    assert len(re.findall(r"all-to-all", hlo)) == 0  # the GSPMD shortfall


def test_a2a_in_full_model_train_step():
    """EP all-to-all inside the whole train step: finite loss, step runs."""
    from __graft_entry__ import _flagship
    from hdmoe_tpu.parallel import make_sharded_train_step, shard_train_state
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train.loss import EDMLossConfig
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
    from hdmoe_tpu.train.train_step import TrainConfig, init_train_state, make_train_step

    cfg, _ = _flagship(tiny=True)
    ep_cfg = dc_replace(
        cfg, num_experts=4, expert_sharing="stacked", dispatch="capacity",
        ep_all_to_all=True, unet_kernel_sizes=((3, 3),) * 4, vit_patch_sizes=(4,) * 4,
    )
    mesh = make_mesh(MeshConfig(data=2, model=1, expert=4))
    params = precond_init(jax.random.PRNGKey(5), ep_cfg)
    step = make_train_step(
        ep_cfg, EDMLossConfig(num_experts=4), OptimConfig(total_schedule_steps=100),
        TrainConfig(p_mean=-1.2, p_std=1.6),
        MaskGenerator(expert_attributes=(3.0,) * 4, p_mean=-1.2, p_std=1.6),
        MaskGenerator(expert_attributes=(3.0,) * 4, p_mean=-1.2, p_std=1.6),
        ZetaSchedule(total_steps=100, max_zeta=2.0, min_zeta=0.01),
    )
    state = shard_train_state(init_train_state(params, OptimConfig(total_schedule_steps=100)), mesh)
    with ep_context(mesh):
        sharded = make_sharded_train_step(step, mesh, donate_state=False)
        lat = jax.random.normal(jax.random.PRNGKey(6), (16, 8, 8, 4)) * 0.5
        txt = jax.random.normal(jax.random.PRNGKey(7), (16, 7, ep_cfg.text_emb_dim))
        lowered = sharded.lower(state, lat, txt, jax.random.PRNGKey(8))
        compiled = lowered.compile()
        hlo = compiled.as_text()
        assert len(re.findall(r"all-to-all", hlo)) >= 2
        _, metrics, _ = compiled(state, lat, txt, jax.random.PRNGKey(8))
    assert bool(jnp.isfinite(metrics["loss"]))
