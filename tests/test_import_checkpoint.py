"""The migration bridge: reference torch checkpoints imported via the flat
state_dict (adapters/port.py) must reproduce the reference forward, survive
an orbax save/restore roundtrip through the CLI, and fail loudly on config
mismatch. Complements tests/test_reference_parity_full.py, which ports from
live module attributes — here the input is what a reference user actually
has on disk: ``torch.save({'model_state_dict': ..., 'config': ...})``
(Utils/training.py:242-271)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference repo unavailable", allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, str(REF))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hdmoe_tpu.adapters.port import (  # noqa: E402
    import_reference_checkpoint,
    port_model_state_dict,
)
from hdmoe_tpu.models import HDMOEMConfig, precond_apply  # noqa: E402

# The reference constructor kwargs and the matching framework config for a
# tiny model (same shapes as the full-parity suite).
REF_KW = dict(
    IN_in_channels=4, IN_img_resolution=8, internal_channels=8,
    time_emb_dim=16, text_emb_dim=12, num_experts=2, top_k=1,
    Fourier_bandwidth=1.0, VIT_num_blocks=1, VIT_patch_sizes=[2, 4],
    VIT_num_groups=4, VIT_num_heads=4, VIT_emb_size=16, Unet_num_blocks=1,
    Unet_channel_mult=[1, 2], Unet_kernel_sizes=[(3, 3), (5, 5)],
    Unet_model_channels=8, Unet_channel_mult_emb=2, sigma_data=0.5,
    log_var_channels=8,
)
# the same dict in the reference's saved-config vocabulary (Utils/configs.py)
REF_CONFIG = dict(
    img_channels=4, img_resolution=8, internal_channels=8, time_emb_dim=16,
    text_emb_dim=12, num_experts=2, top_k=1, fourier_bandwidth=1.0,
    VIT_num_blocks=1, VIT_patch_sizes=[2, 4], VIT_num_groups=4,
    VIT_num_heads=4, VIT_emb_size=16, Unet_num_blocks=1,
    Unet_channel_mult=[1, 2], Unet_kernel_sizes=[(3, 3), (5, 5)],
    Unet_model_channels=8, Unet_channel_mult_emb=2, sigma_data=0.5,
    log_var_channels=8,
)


def _ref_model(variant: str):
    if variant == "config1":
        import models.model_config1 as ref_mod
    else:
        import models.model_config2 as ref_mod
    torch.manual_seed(7)
    m = ref_mod.preconditioned_HDMOEM(**REF_KW).eval()
    with torch.no_grad():
        for e in list(m.net.Unet_experts):
            e.out_gain.copy_(torch.tensor(1.0))
        m.net.alpha_txt.copy_(torch.tensor(0.3))
        for v in list(m.net.VIT_experts):
            v.pos_emb.copy_(torch.randn_like(v.pos_emb) * 0.1)
    return m


def _cfg(variant: str) -> HDMOEMConfig:
    return HDMOEMConfig(
        in_channels=4, img_resolution=8, internal_channels=8, time_emb_dim=16,
        text_emb_dim=12, num_experts=2, top_k=1, fourier_bandwidth=1.0,
        vit_num_blocks=1, vit_patch_sizes=(2, 4), vit_num_groups=4,
        vit_num_heads=4, vit_emb_size=16, unet_num_blocks=1,
        unet_channel_mult=(1, 2), unet_kernel_sizes=((3, 3), (5, 5)),
        unet_model_channels=8, unet_channel_mult_emb=2, sigma_data=0.5,
        log_var_channels=8, variant=variant,
    )


def _forward_pair(ref_mod, params, cfg, variant):
    torch.manual_seed(11)
    b = 2
    x = torch.randn(b, 4, 8, 8)
    sigma = torch.exp(torch.randn(b, 1, 1, 1))
    txt = torch.randn(b, 7, 12)
    mask = torch.ones(b, 2)
    kw = {} if variant == "config1" else dict(transition_point=-1.2, softness=1.6)
    with torch.no_grad():
        ref = ref_mod(
            x=x, sigma=sigma, text_emb=txt, Unet_router_mask=mask,
            Vit_router_mask=mask, zeta=0.0, return_log_var=False, **kw
        )
    got = precond_apply(
        params, cfg,
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        jnp.asarray(sigma.numpy()), jnp.asarray(txt.numpy()),
        jnp.asarray(mask.numpy()), jnp.asarray(mask.numpy()), 0.0, **kw,
    )
    return (
        np.transpose(np.asarray(got["denoised"]), (0, 3, 1, 2)),
        ref["denoised"].numpy(),
    )


@pytest.mark.parametrize("variant", ["config2", "config1"])
def test_state_dict_port_forward_parity(variant):
    ref_mod = _ref_model(variant)
    cfg = _cfg(variant)
    params = port_model_state_dict(ref_mod.state_dict(), cfg)
    got, want = _forward_pair(ref_mod, params, cfg, variant)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_import_cli_roundtrip(tmp_path):
    """torch.save -> import-checkpoint CLI -> orbax restore -> same params."""
    variant = "config1"
    ref_mod = _ref_model(variant)
    pt = tmp_path / "final_model1.pt"
    torch.save(
        {
            "step": 123,
            "model_state_dict": ref_mod.state_dict(),
            "optimizer_state_dict": {},
            "mse": 0.25,
            "config": {"model_configs": REF_CONFIG},  # nested wrapper form
        },
        str(pt),
    )

    from hdmoe_tpu.__main__ import main

    out = tmp_path / "imported"
    main(["import-checkpoint", str(pt), "--out", str(out)])

    # restore through the standard manager and check forward parity
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    cfg = _cfg(variant)
    abstract = init_train_state(
        jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0)), OptimConfig()
    )
    state, _, mse = CheckpointManager(str(out)).restore(abstract, jax.random.PRNGKey(0))
    assert int(state.step) == 123
    assert mse == pytest.approx(0.25)
    got, want = _forward_pair(ref_mod, state.params, cfg, variant)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_wrong_config_fails_loudly():
    ref_mod = _ref_model("config2")
    sd = ref_mod.state_dict()
    # too many experts -> missing keys
    import dataclasses

    cfg4 = dataclasses.replace(
        _cfg("config2"), num_experts=4,
        vit_patch_sizes=(2, 4, 2, 4),
        unet_kernel_sizes=((3, 3), (5, 5), (3, 3), (5, 5)),
    )
    with pytest.raises(KeyError, match="missing"):
        port_model_state_dict(sd, cfg4)
    # config1 cfg on a config2 state_dict -> scaling_net keys missing
    with pytest.raises(KeyError, match="scaling_net"):
        port_model_state_dict(sd, _cfg("config1"))
    # extra keys -> leftover error
    sd2 = dict(sd)
    sd2["net.some_future_module.weights"] = torch.zeros(1)
    with pytest.raises(ValueError, match="not consumed"):
        port_model_state_dict(sd2, _cfg("config2"))


def test_import_variant_autodetect(tmp_path):
    """config1 checkpoints self-identify via scaling_net keys even when the
    caller guesses config2; config2 state_dicts demote a config1 guess."""
    ref_mod = _ref_model("config2")
    pt = tmp_path / "m.pt"
    torch.save(
        {"step": 1, "model_state_dict": ref_mod.state_dict(), "mse": 0.0,
         "config": REF_CONFIG},  # flat config form
        str(pt),
    )
    params, cfg, meta = import_reference_checkpoint(str(pt), variant="config1")
    assert meta["variant"] == "config2" and cfg.variant == "config2"
    got, want = _forward_pair(ref_mod, params, cfg, "config2")
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# -- export: our pytree -> reference .pt (inverse direction) ----------------


@pytest.mark.parametrize("variant", ["config2", "config1"])
def test_export_inverts_import(variant):
    """export_model_state_dict is the exact inverse of port_model_state_dict:
    reference sd -> our pytree -> flat sd reproduces every key bit-exactly."""
    from hdmoe_tpu.adapters.port import export_model_state_dict

    ref_mod = _ref_model(variant)
    cfg = _cfg(variant)
    want = {k: v.numpy() for k, v in ref_mod.state_dict().items()}
    params = port_model_state_dict(want, cfg)
    got = export_model_state_dict(params, cfg)
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_export_strict_loads_into_reference_model():
    """A model trained HERE loads into the reference torch module with
    strict=True and reproduces our forward — the full outbound bridge."""
    from hdmoe_tpu.adapters.port import export_model_state_dict
    from hdmoe_tpu.models import precond_init

    variant = "config1"
    cfg = _cfg(variant)
    params = jax.device_get(precond_init(jax.random.PRNGKey(3), cfg))
    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32, order="C"))
          for k, v in export_model_state_dict(params, cfg).items()}
    ref_mod = _ref_model(variant)
    ref_mod.load_state_dict(sd, strict=True)
    got, want = _forward_pair(ref_mod, params, cfg, variant)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_export_checkpoint_cli_roundtrip(tmp_path):
    """orbax checkpoint -> export-checkpoint CLI -> torch .pt the import
    path (and therefore the reference) accepts; weights survive both hops."""
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state
    from hdmoe_tpu.__main__ import main

    cfg = _cfg("config1")
    params = precond_init(jax.random.PRNGKey(4), cfg)
    state = init_train_state(params, OptimConfig())
    state = state._replace(step=jnp.asarray(77, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    import dataclasses

    mgr.save(state, jax.random.PRNGKey(0), mse=0.5,
             configs={"model_configs": dataclasses.asdict(cfg)})
    mgr.close()

    pt = tmp_path / "back.pt"
    main(["export-checkpoint", str(tmp_path / "ckpt"), "--out", str(pt)])
    ckpt = torch.load(str(pt), map_location="cpu", weights_only=False)
    assert ckpt["step"] == 77 and ckpt["mse"] == pytest.approx(0.5)

    # the exported file round-trips through our own importer bit-exactly
    params2, cfg2, meta = import_reference_checkpoint(str(pt))
    assert cfg2 == cfg and meta["step"] == 77
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_vocabulary_roundtrip():
    from hdmoe_tpu.adapters.port import config_to_reference_dict
    from hdmoe_tpu.models.configs import config_from_dict

    for variant in ("config1", "config2"):
        cfg = _cfg(variant)
        assert config_from_dict(config_to_reference_dict(cfg)) == cfg
