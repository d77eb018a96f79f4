"""Native JAX AutoencoderKL: the SD-VAE as a pure-function XLA graph.

Re-design of the reference's frozen ``diffusers.AutoencoderKL``
("stabilityai/sd-vae-ft-mse", /root/reference/Utils/VAE_CLIP.py:27-46) with
no diffusers dependency: this environment (and many TPU serving images)
ships torch + safetensors but NOT diffusers, so the previous adapter could
never load real weights here. This module implements the SD 1.x VAE
architecture directly in JAX — NHWC activations, GroupNorm/SiLU/conv
resnet blocks, a single-head mid-block attention, asymmetric-padded
stride-2 downsampling and nearest-neighbor upsampling — and loads torch
checkpoints in the diffusers on-disk format (``config.json`` +
``diffusion_pytorch_model.safetensors``/``.bin``) via a flat key-for-key
state-dict mapping.

Weight layout: the params pytree is a FLAT dict keyed by the torch
state-dict names (e.g. ``"encoder.down_blocks.0.resnets.1.conv2.weight"``)
with values already transformed for NHWC compute:

- conv weights: torch OIHW -> HWIO
- linear (attention to_q/k/v/out) weights: torch (out, in) -> (in, out)
- norm/bias vectors: unchanged

so ``load_torch_vae_params`` is a transparent transform and the loader can
assert every checkpoint key was consumed (see expected_sd_vae_keys /
tests/test_vae_native.py). Architecture constants follow the published
sd-vae-ft-mse config: block_out_channels (128, 256, 512, 512),
layers_per_block 2, latent_channels 4, norm_num_groups 32.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215  # diffusers config value; adapter applies it

    @staticmethod
    def from_json(path: str) -> "VAEConfig":
        with open(path) as f:
            d = json.load(f)
        return VAEConfig(
            in_channels=d.get("in_channels", 3),
            out_channels=d.get("out_channels", 3),
            block_out_channels=tuple(d.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=d.get("layers_per_block", 2),
            latent_channels=d.get("latent_channels", 4),
            norm_num_groups=d.get("norm_num_groups", 32),
            scaling_factor=d.get("scaling_factor", 0.18215),
        )


# ---------------------------------------------------------------------------
# primitive layers (NHWC)
# ---------------------------------------------------------------------------


def _group_norm(x, weight, bias, groups: int, eps: float = 1e-6):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * weight + bias


def _conv(x, w, b, stride: int = 1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def _resnet(p: Dict[str, jnp.ndarray], pre: str, x, groups: int):
    h = _group_norm(x, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"], groups)
    h = _conv(jax.nn.silu(h), p[f"{pre}.conv1.weight"], p[f"{pre}.conv1.bias"])
    h = _group_norm(h, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"], groups)
    h = _conv(jax.nn.silu(h), p[f"{pre}.conv2.weight"], p[f"{pre}.conv2.bias"])
    if f"{pre}.conv_shortcut.weight" in p:
        x = _conv(x, p[f"{pre}.conv_shortcut.weight"], p[f"{pre}.conv_shortcut.bias"])
    return x + h


def _attention(p: Dict[str, jnp.ndarray], pre: str, x, groups: int):
    """Single-head self-attention over the spatial grid (diffusers
    ``Attention`` in the VAE mid block: heads=1, dim = channels)."""
    b, h, w, c = x.shape
    y = _group_norm(x, p[f"{pre}.group_norm.weight"], p[f"{pre}.group_norm.bias"], groups)
    y = y.reshape(b, h * w, c)
    q = y @ p[f"{pre}.to_q.weight"] + p[f"{pre}.to_q.bias"]
    k = y @ p[f"{pre}.to_k.weight"] + p[f"{pre}.to_k.bias"]
    v = y @ p[f"{pre}.to_v.weight"] + p[f"{pre}.to_v.bias"]
    attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(jnp.float32(c)), axis=-1)
    y = attn @ v
    y = y @ p[f"{pre}.to_out.0.weight"] + p[f"{pre}.to_out.0.bias"]
    return x + y.reshape(b, h, w, c)


def _mid_block(p, pre: str, x, groups: int):
    x = _resnet(p, f"{pre}.resnets.0", x, groups)
    x = _attention(p, f"{pre}.attentions.0", x, groups)
    return _resnet(p, f"{pre}.resnets.1", x, groups)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def vae_encode(params: Dict[str, jnp.ndarray], cfg: VAEConfig, pixels: jnp.ndarray):
    """(B, H, W, 3) in [-1, 1] -> posterior (mean, logvar), each
    (B, H/8, W/8, latent_channels); quant_conv applied (diffusers parity)."""
    p, g = params, cfg.norm_num_groups
    x = _conv(pixels, p["encoder.conv_in.weight"], p["encoder.conv_in.bias"])
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            x = _resnet(p, f"encoder.down_blocks.{i}.resnets.{j}", x, g)
        if i < n_blocks - 1:
            # diffusers Downsample2D: pad (left,right,top,bottom)=(0,1,0,1),
            # then stride-2 VALID conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = _conv(x, p[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"],
                      p[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"],
                      stride=2, padding="VALID")
    x = _mid_block(p, "encoder.mid_block", x, g)
    x = _group_norm(x, p["encoder.conv_norm_out.weight"], p["encoder.conv_norm_out.bias"], g)
    x = _conv(jax.nn.silu(x), p["encoder.conv_out.weight"], p["encoder.conv_out.bias"])
    x = _conv(x, p["quant_conv.weight"], p["quant_conv.bias"])
    mean, logvar = jnp.split(x, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_decode(params: Dict[str, jnp.ndarray], cfg: VAEConfig, latents: jnp.ndarray):
    """(B, h, w, latent_channels) UNSCALED latents -> (B, 8h, 8w, 3) in [-1, 1]."""
    p, g = params, cfg.norm_num_groups
    x = _conv(latents, p["post_quant_conv.weight"], p["post_quant_conv.bias"])
    x = _conv(x, p["decoder.conv_in.weight"], p["decoder.conv_in.bias"])
    x = _mid_block(p, "decoder.mid_block", x, g)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            x = _resnet(p, f"decoder.up_blocks.{i}.resnets.{j}", x, g)
        if i < n_blocks - 1:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
            x = _conv(x, p[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"],
                      p[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"])
    x = _group_norm(x, p["decoder.conv_norm_out.weight"], p["decoder.conv_norm_out.bias"], g)
    return _conv(jax.nn.silu(x), p["decoder.conv_out.weight"], p["decoder.conv_out.bias"])


# ---------------------------------------------------------------------------
# torch checkpoint loading
# ---------------------------------------------------------------------------


def expected_sd_vae_keys(cfg: VAEConfig) -> set:
    """The exact state-dict key set of a diffusers AutoencoderKL with this
    config (sd-vae-ft-mse layout). Used by the loader to assert the
    checkpoint was consumed completely."""
    keys = set()

    def resnet(pre, cin, cout):
        for n in ("norm1", "norm2"):
            keys.update({f"{pre}.{n}.weight", f"{pre}.{n}.bias"})
        for n in ("conv1", "conv2"):
            keys.update({f"{pre}.{n}.weight", f"{pre}.{n}.bias"})
        if cin != cout:
            keys.update({f"{pre}.conv_shortcut.weight", f"{pre}.conv_shortcut.bias"})

    def mid(pre, c):
        resnet(f"{pre}.resnets.0", c, c)
        resnet(f"{pre}.resnets.1", c, c)
        a = f"{pre}.attentions.0"
        keys.update({f"{a}.group_norm.weight", f"{a}.group_norm.bias"})
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            keys.update({f"{a}.{n}.weight", f"{a}.{n}.bias"})

    ch = cfg.block_out_channels
    n_blocks = len(ch)
    keys.update({"encoder.conv_in.weight", "encoder.conv_in.bias"})
    cin = ch[0]
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else ch[i], ch[i])
        cin = ch[i]
        if i < n_blocks - 1:
            keys.update({f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
                         f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"})
    mid("encoder.mid_block", ch[-1])
    keys.update({"encoder.conv_norm_out.weight", "encoder.conv_norm_out.bias",
                 "encoder.conv_out.weight", "encoder.conv_out.bias",
                 "quant_conv.weight", "quant_conv.bias",
                 "post_quant_conv.weight", "post_quant_conv.bias",
                 "decoder.conv_in.weight", "decoder.conv_in.bias"})
    mid("decoder.mid_block", ch[-1])
    rev = list(reversed(ch))
    cin = rev[0]
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else rev[i], rev[i])
        cin = rev[i]
        if i < n_blocks - 1:
            keys.update({f"decoder.up_blocks.{i}.upsamplers.0.conv.weight",
                         f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"})
    keys.update({"decoder.conv_norm_out.weight", "decoder.conv_norm_out.bias",
                 "decoder.conv_out.weight", "decoder.conv_out.bias"})
    return keys


def convert_torch_state_dict(state: Dict[str, np.ndarray], cfg: VAEConfig,
                             strict: bool = True) -> Dict[str, jnp.ndarray]:
    """Torch state dict (numpy values) -> NHWC/HWIO flat params.

    With ``strict`` asserts the key set matches the architecture exactly
    (both directions), so a wrong or truncated checkpoint fails loudly
    instead of producing garbage latents.
    """
    state = dict(state)
    # mid-block attention legacy naming (pre-0.17 diffusers: query/key/value/
    # proj_attn, shapes (C, C, 1, 1) or (C, C)) -> to_q/to_k/to_v/to_out.0
    legacy = {"query": "to_q", "key": "to_k", "value": "to_v", "proj_attn": "to_out.0"}
    for k in list(state):
        for old, new in legacy.items():
            tag = f".attentions.0.{old}."
            if tag in k:
                state[k.replace(tag, f".attentions.0.{new}.")] = state.pop(k)
    if strict:
        want, have = expected_sd_vae_keys(cfg), set(state)
        missing, extra = want - have, have - want
        if missing or extra:
            raise ValueError(
                f"state dict mismatch: missing {sorted(missing)[:5]}"
                f"{'...' if len(missing) > 5 else ''} / unexpected "
                f"{sorted(extra)[:5]}{'...' if len(extra) > 5 else ''}")
    out = {}
    for k, v in state.items():
        v = np.asarray(v)
        if v.ndim == 4:  # conv OIHW -> HWIO
            if v.shape[2] == v.shape[3] == 1 and ".attentions." in k:
                # legacy attention projections stored as 1x1 convs
                v = v[:, :, 0, 0].T
            else:
                v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 2:  # linear (out, in) -> (in, out)
            v = v.T
        out[k] = jnp.asarray(v, dtype=jnp.float32)
    return out


def load_torch_vae_params(path: str, strict: bool = True):
    """Load a diffusers-format VAE directory (or a bare checkpoint file).

    Accepts ``diffusion_pytorch_model.safetensors`` (no torch needed) or
    ``.bin`` (needs torch for unpickling). Returns (params, VAEConfig).
    """
    if os.path.isdir(path):
        cfg_path = os.path.join(path, "config.json")
        cfg = VAEConfig.from_json(cfg_path) if os.path.exists(cfg_path) else VAEConfig()
        for name in ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"):
            f = os.path.join(path, name)
            if os.path.exists(f):
                path = f
                break
        else:
            raise FileNotFoundError(f"no VAE checkpoint file under {path}")
    else:
        cfg = VAEConfig()
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path)
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in raw.items()}
    return convert_torch_state_dict(state, cfg, strict=strict), cfg


def sd_vae_state_shapes(cfg: VAEConfig) -> Dict[str, Tuple[int, ...]]:
    """Torch-layout shapes for every expected key (OIHW convs, (out,in)
    linears) — the synthesized-checkpoint generator's source of truth."""
    ch = cfg.block_out_channels
    n_blocks, lc, g = len(ch), cfg.latent_channels, cfg.norm_num_groups
    shapes: Dict[str, Tuple[int, ...]] = {}

    def conv(pre, cin, cout, k=3):
        shapes[f"{pre}.weight"] = (cout, cin, k, k)
        shapes[f"{pre}.bias"] = (cout,)

    def norm(pre, c):
        shapes[f"{pre}.weight"] = (c,)
        shapes[f"{pre}.bias"] = (c,)

    def resnet(pre, cin, cout):
        norm(f"{pre}.norm1", cin)
        conv(f"{pre}.conv1", cin, cout)
        norm(f"{pre}.norm2", cout)
        conv(f"{pre}.conv2", cout, cout)
        if cin != cout:
            conv(f"{pre}.conv_shortcut", cin, cout, k=1)

    def mid(pre, c):
        resnet(f"{pre}.resnets.0", c, c)
        resnet(f"{pre}.resnets.1", c, c)
        a = f"{pre}.attentions.0"
        norm(f"{a}.group_norm", c)
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            shapes[f"{a}.{n}.weight"] = (c, c)
            shapes[f"{a}.{n}.bias"] = (c,)

    conv("encoder.conv_in", cfg.in_channels, ch[0])
    cin = ch[0]
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else ch[i], ch[i])
        cin = ch[i]
        if i < n_blocks - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch[i], ch[i])
    mid("encoder.mid_block", ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", ch[-1], 2 * lc)
    conv("quant_conv", 2 * lc, 2 * lc, k=1)
    conv("post_quant_conv", lc, lc, k=1)
    conv("decoder.conv_in", lc, ch[-1])
    mid("decoder.mid_block", ch[-1])
    rev = list(reversed(ch))
    cin = rev[0]
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else rev[i], rev[i])
        cin = rev[i]
        if i < n_blocks - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", rev[i], rev[i])
    norm("decoder.conv_norm_out", ch[0])
    conv("decoder.conv_out", ch[0], cfg.out_channels)
    assert set(shapes) == expected_sd_vae_keys(cfg)
    return shapes
