"""Heterogeneous expert parallelism via shape-class banks.

The reference's defining feature is per-expert kernel/patch sizes
(model_config1.py:152-177); plain stacked banks homogenize them. The
class-bank path (models/hdmoem.py:_class_bank_dispatch) keeps heterogeneity
at EP scale: one stacked bank per shape class, banks sharded over the
expert mesh axis, tokens exchanged with the explicit all-to-all.

Invariants pinned here:
- single-device class banks match the heterogeneous capacity dispatch
  exactly when fed the same (ported) weights;
- class banks under all-to-all EP on a multi-device mesh match the
  single-device class-bank output;
- specialization-masked experts receive exactly zero gradient.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.models import default_model_config, precond_apply, precond_init
from hdmoe_tpu.models.hdmoem import _class_groups, _unet_expert_cfg, _vit_expert_cfg


def _tiny_cfg(**kw):
    return default_model_config(
        img_resolution=8, internal_channels=16, time_emb_dim=16, text_emb_dim=0,
        num_experts=4, vit_patch_sizes=(2, 2, 4, 4), vit_emb_size=16,
        vit_num_blocks=1, vit_num_groups=4, vit_num_heads=4, unet_num_blocks=1,
        unet_model_channels=16, unet_kernel_sizes=((3, 3), (3, 3), (5, 5), (5, 5)),
        log_var_channels=8, **kw,
    )


def _port_to_class_banks(cfg, het_params):
    """Stack a heterogeneous per-expert param list into per-class banks
    (same grouping order as _class_groups)."""

    def stack(expert_list, cfg_fn):
        banks = {}
        for g, (_ecfg, members) in enumerate(_class_groups(cfg, cfg_fn)):
            banks[f"class{g}"] = jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls), *[expert_list[i] for i in members]
            )
        return {"class_banks": banks}

    net = dict(het_params["net"])
    net["unet_experts"] = stack(het_params["net"]["unet_experts"], _unet_expert_cfg)
    net["vit_experts"] = stack(het_params["net"]["vit_experts"], _vit_expert_cfg)
    return {**het_params, "net": net}


def _run(cfg, params, b=8, sigma_val=0.5):
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.full((b, 1, 1, 1), sigma_val)
    return precond_apply(params, cfg, x, sigma, None, None, None, 0.0)["denoised"]


def test_class_banks_match_heterogeneous_capacity_dispatch():
    het_cfg = _tiny_cfg(dispatch="capacity", capacity_factor=4.0)  # cap = B
    params = precond_init(jax.random.PRNGKey(0), het_cfg)
    out_het = _run(het_cfg, params)

    cb_cfg = replace(het_cfg, expert_sharing="class_banks")
    out_cb = _run(cb_cfg, _port_to_class_banks(het_cfg, params))
    np.testing.assert_allclose(np.asarray(out_cb), np.asarray(out_het), atol=2e-5, rtol=2e-5)


def test_class_banks_init_builds_per_class_shapes():
    cfg = _tiny_cfg(expert_sharing="class_banks")
    params = precond_init(jax.random.PRNGKey(0), cfg)
    banks = params["net"]["unet_experts"]["class_banks"]
    assert set(banks.keys()) == {"class0", "class1"}  # (3,3)x2 and (5,5)x2
    # every leaf carries the class-member leading axis
    for leaf in jax.tree_util.tree_leaves(banks["class0"]):
        assert leaf.shape[0] == 2


def test_class_banks_ep_all_to_all_matches_single_device():
    """8-device mesh, expert axis 2 (each 2-member class shards 1 expert per
    device); capacity = B so neither global nor per-shard selection drops."""
    from hdmoe_tpu.parallel.ep import ep_context
    from hdmoe_tpu.parallel.mesh import MeshConfig, make_mesh

    if jax.device_count() < 4:
        pytest.skip("needs >= 4 virtual devices")
    cfg = _tiny_cfg(expert_sharing="class_banks", capacity_factor=4.0)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    out_single = _run(cfg, params)

    mesh = make_mesh(MeshConfig(data=jax.device_count() // 2, model=1, expert=2))
    ep_cfg = replace(cfg, ep_all_to_all=True)
    with ep_context(mesh):
        out_ep = jax.jit(lambda p: _run(ep_cfg, p))(params)
    np.testing.assert_allclose(np.asarray(out_ep), np.asarray(out_single), atol=2e-4, rtol=2e-4)


def test_class_banks_masked_expert_zero_gradient():
    """The reference MoE invariant (test_routers.py:146-178): an expert
    masked out by the specialization mask gets EXACTLY zero gradient."""
    cfg = _tiny_cfg(expert_sharing="class_banks", capacity_factor=4.0)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    b = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.full((b, 1, 1, 1), 0.5)
    # mask out experts 1..3 on both paths -> only expert 0 (class0 member 0)
    # can receive tokens
    mask = jnp.zeros((b, cfg.num_experts)).at[:, 0].set(1.0)

    def loss(p):
        out = precond_apply(p, cfg, x, sigma, None, mask, mask, 0.0)
        return jnp.sum(out["denoised"] ** 2)

    g = jax.grad(loss)(params)
    for path in ("unet_experts", "vit_experts"):
        banks = g["net"][path]["class_banks"]
        # class1 (experts 2, 3) fully masked -> zero grads
        for leaf in jax.tree_util.tree_leaves(banks["class1"]):
            assert float(jnp.abs(leaf).max()) == 0.0
        # class0 member 1 (expert 1) masked -> its slice of every leaf zero
        for leaf in jax.tree_util.tree_leaves(banks["class0"]):
            assert float(jnp.abs(leaf[1]).max()) == 0.0
            # member 0 trains
        assert any(
            float(jnp.abs(leaf[0]).max()) > 0.0
            for leaf in jax.tree_util.tree_leaves(banks["class0"])
        )
