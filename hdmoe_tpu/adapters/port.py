"""Import a reference torch checkpoint into the framework's param layout.

The reference saves ``{'step', 'model_state_dict', 'optimizer_state_dict',
'mse', 'config'}`` via ``torch.save`` (Utils/training.py:242-271) and can
reload only the weights in its inference path (Utils/training.py:277-304).
This adapter is the migration bridge MIGRATING.md promises: it maps that
flat ``model_state_dict`` (the ``preconditioned_HDMOEM`` of either
models/model_config1.py or model_config2.py) onto our pytree layout, so a
user's trained reference checkpoint samples/trains/serves here unchanged.

Design notes (why not a name-for-name copy): our params are nested
(init, apply)-pair pytrees in NHWC with MP weights under ``"mpw"`` —
the mapping is structural, driven by the same ``unet_expert_plan`` that
built the pytree, not by string rewriting. The torch dependency is
load-time only (reading the ``.pt`` pickle); the mapping itself is
numpy -> jnp. Every checkpoint key must be consumed exactly once —
leftover or missing keys raise with the full list, so a config/shape
mismatch fails loudly instead of sampling garbage.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hdmoe_tpu.models import components as comp
from hdmoe_tpu.models.configs import HDMOEMConfig, config_from_dict
from hdmoe_tpu.models.hdmoem import _unet_expert_cfg, _vit_expert_cfg, precond_init


def _np(v) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32-preserving numpy array."""
    if hasattr(v, "detach"):  # torch tensor, without importing torch here
        v = v.detach().cpu().numpy()
    return np.asarray(v)


class _StateDict:
    """Flat reference state_dict with consumed-key accounting."""

    def __init__(self, sd: Mapping[str, Any]):
        self._sd = {k: v for k, v in sd.items()}
        self._used: set = set()

    def take(self, key: str) -> jnp.ndarray:
        if key not in self._sd:
            raise KeyError(
                f"reference checkpoint is missing '{key}' — wrong config "
                f"(variant/num_experts/num_blocks) for this state_dict?"
            )
        self._used.add(key)
        return jnp.asarray(_np(self._sd[key]))

    def has(self, key: str) -> bool:
        return key in self._sd

    def leftovers(self) -> list:
        return sorted(set(self._sd) - self._used)


# -- leaf builders: reference module param names -> our pytree nodes --------

def _conv(sd: _StateDict, p: str) -> dict:
    return {"mpw": sd.take(f"{p}.weights")}  # MP_Conv, model_internals.py:235


def _lin1x1(sd: _StateDict, p: str) -> dict:
    w = sd.take(f"{p}.weights")
    return {"mpw": w.squeeze(-1).squeeze(-1)}  # (O,C,1,1) conv -> (O,C) linear


def _norm(sd: _StateDict, p: str) -> dict:
    return {"scale": sd.take(f"{p}.weight"), "bias": sd.take(f"{p}.bias")}


def _fourier(sd: _StateDict, p: str) -> dict:
    # registered buffers, model_internals.py:156-157
    return {"freqs": sd.take(f"{p}.freqs"), "phases": sd.take(f"{p}.phases")}


def _attn(sd: _StateDict, p: str) -> dict:
    out = {
        "q_proj": _lin1x1(sd, f"{p}.q_proj"),
        "k_proj": _lin1x1(sd, f"{p}.k_proj"),
        "v_proj": _lin1x1(sd, f"{p}.v_proj"),
        "out_proj": _lin1x1(sd, f"{p}.out_proj"),
    }
    if sd.has(f"{p}.rel_pos_bias"):
        out["rel_pos_bias"] = sd.take(f"{p}.rel_pos_bias")
    for name in ("q_time", "k_time", "v_time"):
        if sd.has(f"{p}.{name}.weights"):
            out[name] = _lin1x1(sd, f"{p}.{name}")
    return out


def _router(sd: _StateDict, p: str) -> dict:
    # hard_route Sequential: convs at 0/3/6, GroupNorms at 1/4/7
    return {
        "conv1": _conv(sd, f"{p}.hard_route.0"),
        "gn1": _norm(sd, f"{p}.hard_route.1"),
        "conv2": _conv(sd, f"{p}.hard_route.3"),
        "gn2": _norm(sd, f"{p}.hard_route.4"),
        "conv3": _conv(sd, f"{p}.hard_route.6"),
        "gn3": _norm(sd, f"{p}.hard_route.7"),
        "time_linear": _conv(sd, f"{p}.time_linear"),
        "linear": _conv(sd, f"{p}.linear"),
    }


def _scaling_net(sd: _StateDict, p: str) -> dict:
    # config1's learned Scaling_router: soft_route Sequential + linear head
    return {
        "fc1": _conv(sd, f"{p}.soft_route.0"),
        "gn1": _norm(sd, f"{p}.soft_route.1"),
        "fc2": _conv(sd, f"{p}.soft_route.3"),
        "gn2": _norm(sd, f"{p}.soft_route.4"),
        "out": _conv(sd, f"{p}.linear"),
    }


def _vit_block(sd: _StateDict, p: str) -> dict:
    out = {
        "gn": _norm(sd, f"{p}.GN"),
        "linear1": _conv(sd, f"{p}.linear1"),
        "norm1": _norm(sd, f"{p}.norm1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "tmsa": _attn(sd, f"{p}.TMSA"),
        "linear2": _conv(sd, f"{p}.linear2"),
        "linear3": _conv(sd, f"{p}.linear3"),
    }
    if sd.has(f"{p}.skip_proj.weights"):
        out["skip_proj"] = _conv(sd, f"{p}.skip_proj")
    return out


def _vit_expert(sd: _StateDict, p: str, cfg: comp.VitExpertCfg) -> dict:
    out = {
        "patch_w": sd.take(f"{p}.patch.weight"),
        "patch_b": sd.take(f"{p}.patch.bias"),
        "pos_emb": sd.take(f"{p}.pos_emb"),
        "norm": _norm(sd, f"{p}.norm"),
        "unpatch_proj": _conv(sd, f"{p}.unpatch_proj"),
        "blocks": [_vit_block(sd, f"{p}.diffit.{j}") for j in range(cfg.num_blocks)],
    }
    if sd.has(f"{p}.map_txt.weights"):
        out["map_txt"] = _conv(sd, f"{p}.map_txt")
    return out


def _unet_block(sd: _StateDict, p: str) -> dict:
    out = {
        "emb_layer": _conv(sd, f"{p}.emb_layer"),
        "conv_res1": _conv(sd, f"{p}.conv_res1"),
        "conv_res2": _conv(sd, f"{p}.conv_res2"),
    }
    if sd.has(f"{p}.conv_skip.weights"):
        out["conv_skip"] = _conv(sd, f"{p}.conv_skip")
    return out


def _unet_expert(sd: _StateDict, p: str, cfg: comp.UnetExpertCfg) -> dict:
    enc, dec, _ = comp.unet_expert_plan(cfg)
    out = {
        "out_gain": sd.take(f"{p}.out_gain"),
        "map_noise": _conv(sd, f"{p}.map_noise"),
        "out_conv": _conv(sd, f"{p}.out_conv"),
        "encoders": {
            name: (_conv(sd, f"{p}.encoders.{name}") if kind == "conv"
                   else _unet_block(sd, f"{p}.encoders.{name}"))
            for name, kind, _spec in enc
        },
        "decoders": {
            name: _unet_block(sd, f"{p}.decoders.{name}") for name, _kind, _spec in dec
        },
    }
    if sd.has(f"{p}.map_text.weights"):
        out["map_text"] = _conv(sd, f"{p}.map_text")
    return out


# -- public API --------------------------------------------------------------

def port_model_state_dict(state_dict: Mapping[str, Any], cfg: HDMOEMConfig) -> dict:
    """Reference ``preconditioned_HDMOEM.state_dict()`` -> our param pytree.

    Consumes every key exactly once; raises ``KeyError`` on a missing key
    (config mismatch) and ``ValueError`` listing leftover keys (extra
    modules the mapping didn't expect).
    """
    sd = _StateDict(state_dict)
    net = {
        "input_proj": _conv(sd, "net.input_proj"),
        "fourier": _fourier(sd, "net.Fourier_emb"),
        "out_fourier1": _conv(sd, "net.out_fourier1"),
        "out_fourier2": _conv(sd, "net.out_fourier2"),
        "unet_router": _router(sd, "net.Unet_router"),
        "vit_router": _router(sd, "net.vit_router"),
        "alpha_txt": sd.take("net.alpha_txt"),
        "unet_experts": [
            _unet_expert(sd, f"net.Unet_experts.{i}", _unet_expert_cfg(cfg, i))
            for i in range(cfg.num_experts)
        ],
        "vit_experts": [
            _vit_expert(sd, f"net.VIT_experts.{i}", _vit_expert_cfg(cfg, i))
            for i in range(cfg.num_experts)
        ],
        "cross_attn": _attn(sd, "net.cross_attn"),
        "cross_attn_text": _attn(sd, "net.cross_attn_text"),
        "gate1": _conv(sd, "net.gate1"),
        "gate2": _conv(sd, "net.gate2"),
        "output_proj": _conv(sd, "net.output_proj"),
    }
    if cfg.variant == "config1":
        net["scaling_net"] = _scaling_net(sd, "net.scaling_net")
    params = {
        "log_var_fourier": _fourier(sd, "log_var_fourier"),
        "log_var_linear": _conv(sd, "log_var_linear"),
        "net": net,
    }
    left = sd.leftovers()
    if left:
        raise ValueError(
            f"{len(left)} reference checkpoint keys were not consumed "
            f"(config mismatch — wrong variant or expert/block counts?): {left}"
        )
    _check_against_init(params, cfg)
    return params


def _check_against_init(params: dict, cfg: HDMOEMConfig) -> None:
    """Structure+shape check against a fresh ``precond_init`` (eval_shape —
    no compute). Catches silent transposes/reshapes the key walk can't."""
    ref = jax.eval_shape(lambda k: precond_init(k, cfg), jax.random.PRNGKey(0))
    got_paths = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_leaves_with_path(params)}
    want_paths = {jax.tree_util.keystr(p): v.shape
                  for p, v in jax.tree_util.tree_leaves_with_path(ref)}
    if got_paths != want_paths:
        missing = sorted(set(want_paths) - set(got_paths))
        extra = sorted(set(got_paths) - set(want_paths))
        mis = sorted(k for k in set(got_paths) & set(want_paths)
                     if got_paths[k] != want_paths[k])
        raise ValueError(
            "ported params do not match precond_init(cfg):"
            + (f"\n  missing: {missing}" if missing else "")
            + (f"\n  extra: {extra}" if extra else "")
            + (f"\n  shape mismatch: {[(k, got_paths[k], want_paths[k]) for k in mis]}"
               if mis else "")
        )


def reference_config_dict(ckpt_config: Any) -> Dict[str, Any]:
    """The model-config dict out of whatever the reference stored.

    ``save_checkpoint`` saves whatever ``configs`` it was handed — either
    the flat ``model_configs`` dict or a wrapper with a ``model_configs``
    sub-dict (Utils/training.py:250-253 probes both the same way)."""
    if isinstance(ckpt_config, dict) and "model_configs" in ckpt_config:
        return dict(ckpt_config["model_configs"])
    if isinstance(ckpt_config, dict):
        return dict(ckpt_config)
    raise TypeError(f"unrecognized checkpoint config type: {type(ckpt_config)}")


# -- export: our pytree -> reference flat state_dict (inverse mapping) ------

class _Emitter:
    """Flat state_dict writer with duplicate-key detection (the exact
    inverse of :class:`_StateDict`'s consumed-key accounting)."""

    def __init__(self):
        self.sd: Dict[str, np.ndarray] = {}

    def put(self, key: str, v) -> None:
        if key in self.sd:
            raise ValueError(f"duplicate export key {key!r}")
        self.sd[key] = np.asarray(v)


def _e_conv(em: _Emitter, p: str, node: dict) -> None:
    em.put(f"{p}.weights", node["mpw"])


def _e_lin1x1(em: _Emitter, p: str, node: dict) -> None:
    em.put(f"{p}.weights", np.asarray(node["mpw"])[:, :, None, None])


def _e_norm(em: _Emitter, p: str, node: dict) -> None:
    em.put(f"{p}.weight", node["scale"])
    em.put(f"{p}.bias", node["bias"])


def _e_fourier(em: _Emitter, p: str, node: dict) -> None:
    em.put(f"{p}.freqs", node["freqs"])
    em.put(f"{p}.phases", node["phases"])


def _e_attn(em: _Emitter, p: str, node: dict) -> None:
    for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                         ("v_proj", "v_proj"), ("out_proj", "out_proj")):
        _e_lin1x1(em, f"{p}.{theirs}", node[ours])
    if "rel_pos_bias" in node:
        em.put(f"{p}.rel_pos_bias", node["rel_pos_bias"])
    for name in ("q_time", "k_time", "v_time"):
        if name in node:
            _e_lin1x1(em, f"{p}.{name}", node[name])


def _e_router(em: _Emitter, p: str, node: dict) -> None:
    _e_conv(em, f"{p}.hard_route.0", node["conv1"])
    _e_norm(em, f"{p}.hard_route.1", node["gn1"])
    _e_conv(em, f"{p}.hard_route.3", node["conv2"])
    _e_norm(em, f"{p}.hard_route.4", node["gn2"])
    _e_conv(em, f"{p}.hard_route.6", node["conv3"])
    _e_norm(em, f"{p}.hard_route.7", node["gn3"])
    _e_conv(em, f"{p}.time_linear", node["time_linear"])
    _e_conv(em, f"{p}.linear", node["linear"])


def _e_scaling_net(em: _Emitter, p: str, node: dict) -> None:
    _e_conv(em, f"{p}.soft_route.0", node["fc1"])
    _e_norm(em, f"{p}.soft_route.1", node["gn1"])
    _e_conv(em, f"{p}.soft_route.3", node["fc2"])
    _e_norm(em, f"{p}.soft_route.4", node["gn2"])
    _e_conv(em, f"{p}.linear", node["out"])


def _e_vit_block(em: _Emitter, p: str, node: dict) -> None:
    _e_norm(em, f"{p}.GN", node["gn"])
    _e_conv(em, f"{p}.linear1", node["linear1"])
    _e_norm(em, f"{p}.norm1", node["norm1"])
    _e_norm(em, f"{p}.norm2", node["norm2"])
    _e_attn(em, f"{p}.TMSA", node["tmsa"])
    _e_conv(em, f"{p}.linear2", node["linear2"])
    _e_conv(em, f"{p}.linear3", node["linear3"])
    if "skip_proj" in node:
        _e_conv(em, f"{p}.skip_proj", node["skip_proj"])


def _e_vit_expert(em: _Emitter, p: str, node: dict) -> None:
    em.put(f"{p}.patch.weight", node["patch_w"])
    em.put(f"{p}.patch.bias", node["patch_b"])
    em.put(f"{p}.pos_emb", node["pos_emb"])
    _e_norm(em, f"{p}.norm", node["norm"])
    _e_conv(em, f"{p}.unpatch_proj", node["unpatch_proj"])
    for j, blk in enumerate(node["blocks"]):
        _e_vit_block(em, f"{p}.diffit.{j}", blk)
    if "map_txt" in node:
        _e_conv(em, f"{p}.map_txt", node["map_txt"])


def _e_unet_block(em: _Emitter, p: str, node: dict) -> None:
    _e_conv(em, f"{p}.emb_layer", node["emb_layer"])
    _e_conv(em, f"{p}.conv_res1", node["conv_res1"])
    _e_conv(em, f"{p}.conv_res2", node["conv_res2"])
    if "conv_skip" in node:
        _e_conv(em, f"{p}.conv_skip", node["conv_skip"])


def _e_unet_expert(em: _Emitter, p: str, node: dict) -> None:
    em.put(f"{p}.out_gain", node["out_gain"])
    _e_conv(em, f"{p}.map_noise", node["map_noise"])
    _e_conv(em, f"{p}.out_conv", node["out_conv"])
    for name, sub in node["encoders"].items():
        if set(sub) == {"mpw"}:
            _e_conv(em, f"{p}.encoders.{name}", sub)
        else:
            _e_unet_block(em, f"{p}.encoders.{name}", sub)
    for name, sub in node["decoders"].items():
        _e_unet_block(em, f"{p}.decoders.{name}", sub)
    if "map_text" in node:
        _e_conv(em, f"{p}.map_text", node["map_text"])


def export_model_state_dict(params: dict, cfg: HDMOEMConfig) -> Dict[str, np.ndarray]:
    """Our param pytree -> the reference's flat ``state_dict`` key layout
    (exact inverse of :func:`port_model_state_dict`; round-trip tested in
    tests/test_import_checkpoint.py). Values are float32 numpy arrays —
    callers torch-ify as needed."""
    em = _Emitter()
    net = params["net"]
    _e_conv(em, "net.input_proj", net["input_proj"])
    _e_fourier(em, "net.Fourier_emb", net["fourier"])
    _e_conv(em, "net.out_fourier1", net["out_fourier1"])
    _e_conv(em, "net.out_fourier2", net["out_fourier2"])
    _e_router(em, "net.Unet_router", net["unet_router"])
    _e_router(em, "net.vit_router", net["vit_router"])
    em.put("net.alpha_txt", net["alpha_txt"])
    for i, e in enumerate(net["unet_experts"]):
        _e_unet_expert(em, f"net.Unet_experts.{i}", e)
    for i, v in enumerate(net["vit_experts"]):
        _e_vit_expert(em, f"net.VIT_experts.{i}", v)
    _e_attn(em, "net.cross_attn", net["cross_attn"])
    _e_attn(em, "net.cross_attn_text", net["cross_attn_text"])
    _e_conv(em, "net.gate1", net["gate1"])
    _e_conv(em, "net.gate2", net["gate2"])
    _e_conv(em, "net.output_proj", net["output_proj"])
    if cfg.variant == "config1":
        _e_scaling_net(em, "net.scaling_net", net["scaling_net"])
    _e_fourier(em, "log_var_fourier", params["log_var_fourier"])
    _e_conv(em, "log_var_linear", params["log_var_linear"])
    return em.sd


def config_to_reference_dict(cfg: HDMOEMConfig) -> Dict[str, Any]:
    """Our config -> the reference's saved-config vocabulary (the exact
    inverse of :func:`hdmoe_tpu.models.configs.config_from_dict`)."""
    return {
        "img_channels": cfg.in_channels,
        "img_resolution": cfg.img_resolution,
        "internal_channels": cfg.internal_channels,
        "time_emb_dim": cfg.time_emb_dim,
        "text_emb_dim": cfg.text_emb_dim,
        "num_experts": cfg.num_experts,
        "top_k": cfg.top_k,
        "fourier_bandwidth": cfg.fourier_bandwidth,
        "VIT_num_blocks": cfg.vit_num_blocks,
        "VIT_patch_sizes": list(cfg.vit_patch_sizes),
        "VIT_num_groups": cfg.vit_num_groups,
        "VIT_num_heads": cfg.vit_num_heads,
        "VIT_emb_size": cfg.vit_emb_size,
        "Unet_num_blocks": cfg.unet_num_blocks,
        "Unet_channel_mult": list(cfg.unet_channel_mult),
        "Unet_kernel_sizes": [list(k) for k in cfg.unet_kernel_sizes],
        "Unet_model_channels": cfg.unet_model_channels,
        "Unet_channel_mult_emb": cfg.unet_channel_mult_emb,
        "Unet_label_balance": cfg.unet_label_balance,
        "Unet_concat_balance": cfg.unet_concat_balance,
        "sigma_data": cfg.sigma_data,
        "log_var_channels": cfg.log_var_channels,
        "variant": cfg.variant,
    }


def model_config_from_saved_json(d: Dict[str, Any]) -> HDMOEMConfig:
    """Rebuild the model config from a checkpoint's ``config_{step}.json``.

    Handles both layouts that file carries: the training loop saves our
    dataclass fields under ``model_configs`` (train_loop.py configs_blob),
    while ``import-checkpoint`` saves the reference vocabulary flat
    (img_channels, VIT_num_blocks, ...)."""
    if isinstance(d.get("model_configs"), dict):
        m = d["model_configs"]
        if "img_channels" in m:
            return config_from_dict(m)
        kw = dict(m)
        for k in ("vit_patch_sizes", "unet_channel_mult"):
            if k in kw and kw[k] is not None:
                kw[k] = tuple(kw[k])
        if kw.get("unet_kernel_sizes") is not None:
            kw["unet_kernel_sizes"] = tuple(tuple(x) for x in kw["unet_kernel_sizes"])
        valid = set(HDMOEMConfig.__dataclass_fields__)
        return HDMOEMConfig(**{k: v for k, v in kw.items() if k in valid})
    if "img_channels" in d:
        return config_from_dict(d)
    raise ValueError(
        "unrecognized saved config layout (no 'model_configs' dict and no "
        f"reference-vocabulary keys): {sorted(d)[:8]}..."
    )


def export_reference_checkpoint(
    params: dict,
    cfg: HDMOEMConfig,
    out_path: str,
    step: int = 0,
    mse: float = float("nan"),
) -> None:
    """Write a reference-loadable ``.pt``: the same dict shape
    ``save_checkpoint`` produces (Utils/training.py:242-271), so reference
    tooling (its inference path, its own resume-on-weights) consumes a model
    trained here. Optimizer moments are not portable (different layout) —
    the reference side resumes warm on weights, cold on Adam state, exactly
    mirroring import_reference_checkpoint's contract."""
    import torch  # save-time only

    params = jax.device_get(params)
    # np.array (not ascontiguousarray, which promotes 0-d scalars like
    # out_gain/alpha_txt to (1,)) keeps reference shapes exactly and gives
    # torch a writable copy.
    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32, order="C"))
          for k, v in export_model_state_dict(params, cfg).items()}
    torch.save(
        {
            "step": int(step),
            "model_state_dict": sd,
            "optimizer_state_dict": {},
            "mse": float(mse),
            "config": {"model_configs": config_to_reference_dict(cfg)},
        },
        out_path,
    )


def import_reference_checkpoint(
    path: str,
    variant: str = "config1",
    config_overrides: Optional[Dict[str, Any]] = None,
) -> Tuple[dict, HDMOEMConfig, Dict[str, Any]]:
    """Load a reference ``.pt`` checkpoint -> (params, cfg, meta).

    ``variant`` picks config1/config2 semantics (the reference class is not
    recorded in the checkpoint; config1 checkpoints carry ``scaling_net.*``
    keys, and a wrong guess fails the consumed-keys check loudly).
    ``meta`` carries step/mse plus the original config dict.
    """
    import torch  # load-time only

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" not in ckpt:
        raise ValueError(
            f"{path} lacks 'model_state_dict' — not a reference save_checkpoint file"
        )
    ref_cfg = reference_config_dict(ckpt.get("config", {}))
    ref_cfg.update(config_overrides or {})
    # config1 checkpoints are self-identifying via the scaling net
    if any(k.startswith("net.scaling_net.") for k in ckpt["model_state_dict"]):
        variant = "config1"
    elif variant == "config1":
        variant = "config2"
    cfg = config_from_dict({**ref_cfg, "variant": variant})
    params = port_model_state_dict(ckpt["model_state_dict"], cfg)
    meta = {
        "step": int(ckpt.get("step", 0)),
        "mse": float(ckpt.get("mse", float("nan"))),
        "config": ref_cfg,
        "variant": variant,
    }
    return params, cfg, meta
