"""Routers and expert networks, TPU-native.

Functional re-design of reference models/model_components.py:

- ``scaling_router``  <- Scaling_router (model_components.py:7-66)
- ``router``          <- Router (model_components.py:68-168)
- ``unet_block``      <- Unet_block (model_components.py:171-253)
- ``unet_expert``     <- Unet_expert (model_components.py:255-433)
- ``vit_block``       <- Vit_block (model_components.py:435-562)
- ``vit_expert``      <- Vit_expert (model_components.py:564-706)

All activations are NHWC / (B, L, C); every module is an (init, apply) pair
over plain dict pytrees; train-time stochasticity (router exploration noise,
dropout) consumes explicit jax.random keys so the whole model jits with
deterministic PRNG.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from hdmoe_tpu.ops import mp
from hdmoe_tpu.ops.attention import mp_attention_apply, mp_attention_init

# ---------------------------------------------------------------------------
# Scaling router (soft path gate; used by the config1 model variant)
# ---------------------------------------------------------------------------


def scaling_router_init(key: jax.Array, emb_dim: int = 3, num_experts: int = 2) -> dict:
    k = jax.random.split(key, 3)
    return {
        "fc1": mp.mp_conv_init(k[0], emb_dim, emb_dim * 2),
        "gn1": mp.group_norm_init(emb_dim * 2),
        "fc2": mp.mp_conv_init(k[1], emb_dim * 2, emb_dim * 4),
        "gn2": mp.group_norm_init(emb_dim * 4),
        "out": mp.mp_conv_init(k[2], emb_dim * 4, num_experts),
    }


def scaling_router_apply(
    params: dict,
    x: jnp.ndarray,
    zeta: float = 1e-2,
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
    dropout_rate: float = 0.2,
) -> jnp.ndarray:
    """MLP soft gate over the time embedding -> (B, E) factors summing to 2.

    Mirrors Scaling_router.forward (model_components.py:41-66): two
    Linear+GroupNorm(1)+ReLU stages, dropout, linear head, train-time
    exploration noise ``randn*zeta``, then ``softmax * 2``.
    """
    if x.ndim == 3:
        x = x.squeeze(1)
    h = mp.mp_conv_apply(params["fc1"], x)
    h = jax.nn.relu(mp.group_norm_apply(params["gn1"], h, num_groups=1))
    h = mp.mp_conv_apply(params["fc2"], h)
    h = jax.nn.relu(mp.group_norm_apply(params["gn2"], h, num_groups=1))
    if train and key is not None:
        kd, kn = jax.random.split(key)
        h = mp.dropout(h, dropout_rate, kd, train)
        logits = mp.mp_conv_apply(params["out"], h)
        logits = logits + jax.random.normal(kn, logits.shape, logits.dtype) * zeta
    else:
        logits = mp.mp_conv_apply(params["out"], h)
    return jax.nn.softmax(logits, axis=-1) * 2.0


# ---------------------------------------------------------------------------
# Sparse top-k router
# ---------------------------------------------------------------------------


def router_init(key: jax.Array, in_channels: int, time_dim: int, num_experts: int) -> dict:
    k = jax.random.split(key, 5)
    c = in_channels
    return {
        "conv1": mp.mp_conv_init(k[0], c, c * 2, (3, 3)),
        "gn1": mp.group_norm_init(c * 2),
        "conv2": mp.mp_conv_init(k[1], c * 2, c * 4, (3, 3)),
        "gn2": mp.group_norm_init(c * 4),
        "conv3": mp.mp_conv_init(k[2], c * 4, c * 4, (3, 3)),
        "gn3": mp.group_norm_init(c * 4),
        "time_linear": mp.mp_conv_init(k[3], time_dim, c * 4 * 2),
        "linear": mp.mp_conv_init(k[4], c * 4, num_experts),
    }


def router_apply(
    params: dict,
    x: jnp.ndarray,
    time_emb: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    zeta: float = 1e-2,
    *,
    top_k: int,
    train: bool = False,
    key: Optional[jax.Array] = None,
    dropout_rate: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sparse top-k gate (Router.forward, model_components.py:118-168).

    Feature CNN (3x [MP conv3x3 + GroupNorm(1) + ReLU]) -> global average pool
    -> dropout -> adaLN time modulation ``x*(1+gamma)+beta`` -> expert logits
    -> train-time exploration noise -> specialization mask (-inf fill) ->
    (sparse top-k weights scattered to dense (B, E), full softmax probs,
    raw logits).

    ``x`` is NHWC. Returns float32 gate tensors.
    """
    b = x.shape[0]
    h = jax.nn.relu(mp.group_norm_apply(params["gn1"], mp.mp_conv_apply(params["conv1"], x), num_groups=1))
    h = jax.nn.relu(mp.group_norm_apply(params["gn2"], mp.mp_conv_apply(params["conv2"], h), num_groups=1))
    h = jax.nn.relu(mp.group_norm_apply(params["gn3"], mp.mp_conv_apply(params["conv3"], h), num_groups=1))
    h = h.mean(axis=(1, 2))  # global average pool -> (B, 4C)

    kd = kn = None
    if train and key is not None:
        kd, kn = jax.random.split(key)
    h = mp.dropout(h, dropout_rate, kd, train)

    if time_emb.ndim == 3:
        time_emb = time_emb.squeeze(1)
    cond = mp.mp_conv_apply(params["time_linear"], mp.mp_silu(time_emb))
    gamma, beta = jnp.split(cond, 2, axis=1)
    h = h * (1.0 + gamma) + beta
    logits = mp.mp_conv_apply(params["linear"], h).astype(jnp.float32)
    if train and kn is not None:
        logits = logits + jax.random.normal(kn, logits.shape, logits.dtype) * zeta
    if mask is not None:
        logits = jnp.where(mask == 0, -jnp.inf, logits)

    gate_probs = jax.nn.softmax(logits, axis=-1)
    topk_vals, topk_idx = lax.top_k(logits, top_k)
    gating_weights = jax.nn.softmax(topk_vals, axis=-1)
    sparse = jnp.zeros_like(logits).at[jnp.arange(b)[:, None], topk_idx].set(gating_weights)
    return sparse, gate_probs, logits


# ---------------------------------------------------------------------------
# U-Net expert
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UnetBlockCfg:
    in_channels: int
    out_channels: int
    kernel: Tuple[int, int]
    emb_size: int
    resample: str = "keep"  # keep | up | down
    block_type: str = "enc"  # enc | dec
    residual_balance: float = 0.5
    dropout: float = 0.2
    emb_gain: float = 1.0
    conv_gain: float = 1.0


def unet_block_init(key: jax.Array, cfg: UnetBlockCfg) -> dict:
    k = jax.random.split(key, 4)
    params = {
        "emb_layer": mp.mp_conv_init(k[0], cfg.emb_size, cfg.out_channels),
        "conv_res1": mp.mp_conv_init(
            k[1], cfg.out_channels if cfg.block_type == "enc" else cfg.in_channels, cfg.out_channels, cfg.kernel
        ),
        "conv_res2": mp.mp_conv_init(k[2], cfg.out_channels, cfg.out_channels, cfg.kernel),
    }
    if cfg.in_channels != cfg.out_channels:
        params["conv_skip"] = mp.mp_conv_init(k[3], cfg.in_channels, cfg.out_channels, (1, 1))
    return params


def unet_block_apply(
    params: dict,
    cfg: UnetBlockCfg,
    x: jnp.ndarray,
    embedding: jnp.ndarray,
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """EDM2-style MP residual block (Unet_block.forward, model_components.py:220-253).

    enc: resample -> (1x1 skip-proj on channel change) -> pixel norm; main
    branch conv -> embedding modulation ``*(1+emb)`` -> mp_silu -> dropout ->
    conv; dec applies the skip-proj on the residual branch; merge with
    ``mp_sum(x, main, residual_balance)``.
    """
    emb = 1.0 + mp.mp_conv_apply(params["emb_layer"], embedding, gain=cfg.emb_gain)
    x = mp.resample(x, mode=cfg.resample)
    if cfg.block_type == "enc":
        if "conv_skip" in params:
            x = mp.mp_conv_apply(params["conv_skip"], x)
        x = mp.normalize(x, axis=[-1])  # pixel norm over channels (NHWC)

    main = mp.mp_conv_silu_apply(params["conv_res1"], x, gain=cfg.conv_gain)
    if train and cfg.dropout > 0:
        main = main * emb[:, None, None, :].astype(x.dtype)
        main = mp.mp_silu(main)
        main = mp.dropout(main, cfg.dropout, key, train)
        main = mp.mp_conv_apply(params["conv_res2"], main, gain=cfg.conv_gain)
    else:
        # eval (dropout inert): conv(mp_silu(main * emb)) — the silu/scale
        # prologue fuses into the Pallas conv under conv_layout("pallas")
        main = mp.mp_conv_silu_apply(params["conv_res2"], main, gain=cfg.conv_gain, scale=emb)
    if cfg.block_type == "dec" and "conv_skip" in params:
        x = mp.mp_conv_apply(params["conv_skip"], x)
    return mp.mp_sum(x, main, t=cfg.residual_balance)


@dataclass(frozen=True)
class UnetExpertCfg:
    img_resolution: int
    img_channels: int
    time_emb_dim: int
    text_emb_dim: int
    channel_mult: Tuple[int, ...]
    model_channels: int = 192
    channel_mult_emb: Optional[int] = None
    num_blocks: int = 3
    kernel_size: Tuple[int, int] = (3, 3)
    label_balance: float = 0.5
    concat_balance: float = 0.5

    @property
    def emb_size(self) -> int:
        if self.channel_mult_emb is not None:
            return self.model_channels * self.channel_mult_emb
        return max(self.model_channels * m for m in self.channel_mult)


def unet_expert_plan(cfg: UnetExpertCfg):
    """Static walk plan: ordered (name, kind, UnetBlockCfg|channels) entries for
    encoder and decoder, mirroring Unet_expert.__init__'s ModuleDict layout
    (model_components.py:322-387). Used by both init and apply so the
    parameter tree and the forward walk can never drift apart.
    """
    block_channels = [cfg.model_channels * m for m in cfg.channel_mult]
    emb = cfg.emb_size
    enc = []
    out_ch = cfg.img_channels + 1  # ones-channel augmentation
    for level, channel in enumerate(block_channels):
        res = cfg.img_resolution >> level
        if level == 0:
            in_ch, out_ch = out_ch, channel
            enc.append((f"{res}x{res}_conv", "conv", (in_ch, out_ch)))
        else:
            enc.append(
                (
                    f"{res}x{res}_down",
                    "block",
                    UnetBlockCfg(out_ch, out_ch, cfg.kernel_size, emb, resample="down", block_type="enc"),
                )
            )
        for i in range(cfg.num_blocks):
            in_ch, out_ch = out_ch, channel
            enc.append(
                (
                    f"{res}x{res}_block{i}",
                    "block",
                    UnetBlockCfg(in_ch, out_ch, cfg.kernel_size, emb, block_type="enc"),
                )
            )

    skips = []
    for name, kind, spec in enc:
        skips.append(spec[1] if kind == "conv" else spec.out_channels)

    dec = []
    for level, channel in reversed(list(enumerate(block_channels))):
        res = cfg.img_resolution >> level
        if level == len(block_channels) - 1:
            for tag in ("in0", "in1"):
                dec.append(
                    (
                        f"{res}x{res}_{tag}",
                        "block",
                        UnetBlockCfg(out_ch, out_ch, cfg.kernel_size, emb, block_type="dec"),
                    )
                )
        else:
            dec.append(
                (
                    f"{res}x{res}_up",
                    "block",
                    UnetBlockCfg(out_ch, out_ch, cfg.kernel_size, emb, resample="up", block_type="dec"),
                )
            )
        for i in range(cfg.num_blocks + 1):
            in_ch = out_ch + skips.pop()
            out_ch = channel
            dec.append(
                (
                    f"{res}x{res}_block{i}",
                    "skip_block",
                    UnetBlockCfg(in_ch, out_ch, cfg.kernel_size, emb, block_type="dec"),
                )
            )
    return enc, dec, out_ch


def unet_expert_init(key: jax.Array, cfg: UnetExpertCfg) -> dict:
    enc, dec, final_ch = unet_expert_plan(cfg)
    n_keys = len(enc) + len(dec) + 4
    keys = iter(jax.random.split(key, n_keys))
    params: dict = {
        "out_gain": jnp.zeros([], dtype=jnp.float32),  # zero output at init
        "map_noise": mp.mp_conv_init(next(keys), cfg.time_emb_dim, cfg.emb_size),
    }
    if cfg.text_emb_dim > 0:
        params["map_text"] = mp.mp_conv_init(next(keys), cfg.text_emb_dim, cfg.emb_size)
    enc_params = {}
    for name, kind, spec in enc:
        if kind == "conv":
            enc_params[name] = mp.mp_conv_init(next(keys), spec[0], spec[1], cfg.kernel_size)
        else:
            enc_params[name] = unet_block_init(next(keys), spec)
    params["encoders"] = enc_params
    dec_params = {}
    for name, kind, spec in dec:
        dec_params[name] = unet_block_init(next(keys), spec)
    params["decoders"] = dec_params
    params["out_conv"] = mp.mp_conv_init(next(keys), final_ch, cfg.img_channels, cfg.kernel_size)
    return params


def unet_expert_apply(
    params: dict,
    cfg: UnetExpertCfg,
    x: jnp.ndarray,
    time_emb: jnp.ndarray,
    text_emb: Optional[jnp.ndarray] = None,
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Full MP U-Net forward (Unet_expert.forward, model_components.py:389-433).

    x is (B, H, W, C). Time/text embeddings are mixed with
    ``mp_sum(t=label_balance)`` (3-D text is mean-pooled over the sequence);
    skip connections merge with ``mp_cat(t=concat_balance)``; the final conv is
    scaled by the learnable scalar ``out_gain`` (zero at init => zero output).
    """
    enc, dec, _ = unet_expert_plan(cfg)
    emb = mp.mp_conv_apply(params["map_noise"], time_emb)
    if "map_text" in params and text_emb is not None:
        if text_emb.ndim == 3:
            text_emb = text_emb.mean(axis=1)
        txt = mp.mp_conv_apply(params["map_text"], text_emb)
        emb = mp.mp_sum(emb, txt, t=cfg.label_balance)
    emb = mp.mp_silu(emb)

    x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    n_blocks = sum(1 for _, kind, _ in enc + dec if kind != "conv")
    keys = iter(jax.random.split(key, n_blocks)) if (train and key is not None) else None

    skips = []
    for name, kind, spec in enc:
        if kind == "conv":
            x = mp.mp_conv_apply(params["encoders"][name], x)
        else:
            x = unet_block_apply(
                params["encoders"][name], spec, x, emb, train=train, key=next(keys) if keys else None
            )
        skips.append(x)

    for name, kind, spec in dec:
        if kind == "skip_block":
            x = mp.mp_cat(x, skips.pop(), axis=-1, t=cfg.concat_balance)
        x = unet_block_apply(params["decoders"][name], spec, x, emb, train=train, key=next(keys) if keys else None)

    return mp.mp_conv_apply(params["out_conv"], x, gain=params["out_gain"])


# ---------------------------------------------------------------------------
# ViT (DiffiT-style) expert
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VitBlockCfg:
    num_heads: int
    num_groups: int
    num_channels: int
    seq_ln: int
    emb_dim: int
    resample: str = "keep"
    time_dim: int = 0
    res_balance: float = 0.5
    attn_balance: float = 0.5
    gain_s: float = 1.0
    gain_t: float = 1.0
    use_flash: bool = False
    attn_impl: Optional[str] = None  # overrides use_flash ("dense"|"flash"|"ring")


def vit_block_init(key: jax.Array, cfg: VitBlockCfg) -> dict:
    k = jax.random.split(key, 5)
    params = {
        "gn": mp.group_norm_init(cfg.num_channels),
        "linear1": mp.mp_conv_init(k[0], cfg.num_channels, cfg.emb_dim),
        "norm1": mp.layer_norm_init(cfg.emb_dim),
        "norm2": mp.layer_norm_init(cfg.emb_dim),
        "tmsa": mp_attention_init(
            k[1], cfg.num_heads, cfg.emb_dim, cfg.seq_ln, time_dim=cfg.time_dim, is_cross_attn=False
        ),
        "linear2": mp.mp_conv_init(k[2], cfg.emb_dim, cfg.emb_dim * 4),
        "linear3": mp.mp_conv_init(k[3], cfg.emb_dim * 4, cfg.emb_dim),
    }
    if cfg.num_channels != cfg.emb_dim:
        params["skip_proj"] = mp.mp_conv_init(k[4], cfg.num_channels, cfg.emb_dim)
    return params


def vit_block_apply(
    params: dict,
    cfg: VitBlockCfg,
    x: jnp.ndarray,
    time_embedding: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DiffiT block forward (Vit_block.forward, model_components.py:502-562).

    (B, L, C) in -> GroupNorm over (C, L) + mp_silu -> linear1 -> LayerNorm ->
    TMSA (time-injected MP self-attention) -> mp_sum residual -> LayerNorm ->
    4x MLP -> mp_sum residual -> outer residual (with skip_proj on dim change).
    """
    x = x  # resample='keep' always at the expert level; sequences are not resampled
    b, seq_ln, in_ch = x.shape
    res_main = x
    h = mp.group_norm_apply(params["gn"], x, num_groups=cfg.num_groups, channel_axis=-1)
    h = mp.mp_silu(h)
    h = mp.mp_conv_apply(params["linear1"], h.reshape(b * seq_ln, in_ch), gain=cfg.gain_s)

    res_attn = h
    y = mp.layer_norm_apply(params["norm1"], h)
    y = y.reshape(b, seq_ln, cfg.emb_dim)
    if time_embedding is not None and time_embedding.ndim == 2:
        time_embedding = time_embedding[:, None, :]
    y = mp_attention_apply(
        params["tmsa"],
        y,
        gain_s=cfg.gain_s,
        gain_t=cfg.gain_t,
        time_embedding=time_embedding,
        num_heads=cfg.num_heads,
        attn_balance=cfg.attn_balance,
        is_cross_attn=False,
        use_flash=cfg.use_flash,
        impl=cfg.attn_impl,
    )
    y = y.reshape(b * seq_ln, cfg.emb_dim)
    y = mp.mp_sum(y, res_attn, t=cfg.res_balance)
    h = mp.layer_norm_apply(params["norm2"], y)
    h = mp.mp_silu(mp.mp_conv_apply(params["linear2"], h, gain=cfg.gain_s))
    h = mp.mp_conv_apply(params["linear3"], h, gain=cfg.gain_s)
    h = mp.mp_sum(h, y, t=cfg.res_balance)
    h = h.reshape(b, seq_ln, cfg.emb_dim)

    if "skip_proj" in params:
        res = mp.mp_conv_apply(params["skip_proj"], res_main.reshape(b * seq_ln, in_ch), gain=cfg.gain_s)
        res = res.reshape(b, seq_ln, cfg.emb_dim)
        return mp.mp_sum(res, h, t=cfg.res_balance)
    return mp.mp_sum(res_main, h, t=cfg.res_balance)


@dataclass(frozen=True)
class VitExpertCfg:
    num_heads: int
    num_groups: int
    in_channels: int
    seq_ln: int
    emb_dim: int
    num_blocks: int
    patch_size: int
    time_dim: int = 0
    text_dim: int = 0
    res_balance: float = 0.5
    attn_balance: float = 0.5
    emb_balance: float = 0.5
    gain_s: float = 1.0
    gain_t: float = 1.0
    use_flash: bool = False
    attn_impl: Optional[str] = None
    # Run the block stack through the GPipe schedule when a
    # parallel.pipeline.pipeline_context is active (deep-ViT configs where
    # num_blocks == the pipeline mesh axis size).
    pipeline_blocks: bool = False

    @property
    def block_cfg(self) -> VitBlockCfg:
        return VitBlockCfg(
            num_heads=self.num_heads,
            num_groups=self.num_groups,
            num_channels=self.emb_dim,
            seq_ln=self.seq_ln,
            emb_dim=self.emb_dim,
            time_dim=self.time_dim,
            res_balance=self.res_balance,
            attn_balance=self.attn_balance,
            gain_s=self.gain_s,
            gain_t=self.gain_t,
            use_flash=self.use_flash,
            attn_impl=self.attn_impl,
        )


def vit_expert_init(key: jax.Array, cfg: VitExpertCfg) -> dict:
    keys = jax.random.split(key, cfg.num_blocks + 4)
    p = cfg.patch_size
    fan_in = cfg.in_channels * p * p
    lim = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(keys[0])
    params: dict = {
        # standard (non-MP) strided conv patchify, torch Conv2d default init
        "patch_w": jax.random.uniform(k_w, (cfg.emb_dim, cfg.in_channels, p, p), minval=-lim, maxval=lim),
        "patch_b": jax.random.uniform(k_b, (cfg.emb_dim,), minval=-lim, maxval=lim),
        "pos_emb": jnp.zeros((1, cfg.seq_ln, cfg.emb_dim), dtype=jnp.float32),
        "norm": mp.layer_norm_init(cfg.emb_dim),
        "unpatch_proj": mp.mp_conv_init(keys[1], cfg.emb_dim, cfg.in_channels * p * p),
    }
    if cfg.text_dim != cfg.time_dim and cfg.text_dim != 0:
        params["map_txt"] = mp.mp_conv_init(keys[2], cfg.text_dim, cfg.time_dim)
    params["blocks"] = [vit_block_init(keys[3 + i], cfg.block_cfg) for i in range(cfg.num_blocks)]
    return params


def vit_expert_apply(
    params: dict,
    cfg: VitExpertCfg,
    x: jnp.ndarray,
    time_emb: Optional[jnp.ndarray] = None,
    text_emb: Optional[jnp.ndarray] = None,
    *,
    train: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Isotropic DiffiT ViT forward (Vit_expert.forward, model_components.py:649-706).

    NHWC in/out. Pads to a patch multiple, patchifies with a strided conv,
    adds learnable absolute position embeddings, mixes time/text conditioning
    with ``mp_sum(t=emb_balance)``, runs the block stack, LayerNorm, linear
    unpatch projection + PixelShuffle, crops back to the input size.
    """
    del train, key  # ViT experts have no train-time stochasticity in the reference
    b, orig_h, orig_w, c = x.shape
    p = cfg.patch_size
    pad_h = (p - orig_h % p) % p
    pad_w = (p - orig_w % p) % p
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    x = lax.conv_general_dilated(
        x,
        params["patch_w"].astype(x.dtype),
        window_strides=(p, p),
        padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    ) + params["patch_b"].astype(x.dtype)
    hp, wp = x.shape[1], x.shape[2]
    assert hp * wp == cfg.seq_ln, f"Sequence length mismatch: got {hp * wp}, expected {cfg.seq_ln}"
    x = x.reshape(b, cfg.seq_ln, cfg.emb_dim)
    x = x + params["pos_emb"].astype(x.dtype)

    if text_emb is not None:
        if "map_txt" in params:
            if text_emb.ndim == 3:
                text_emb = text_emb.mean(axis=1)
            text_emb = mp.mp_conv_apply(params["map_txt"], text_emb)
        time_emb = mp.mp_sum(time_emb, text_emb, t=cfg.emb_balance)

    pp_ctx = None
    if cfg.pipeline_blocks:
        from hdmoe_tpu.parallel.pipeline import current_pipeline_context

        pp_ctx = current_pipeline_context()
    if pp_ctx is not None:
        # Pipeline parallelism over the block stack (parallel/pipeline.py):
        # the homogeneous DiffiT blocks stack into stage params sharded over
        # the pipeline mesh axis; the time embedding rides as the per-
        # microbatch aux input. Grad-exact vs the sequential loop
        # (tests/test_pipeline_in_model.py).
        from hdmoe_tpu.parallel.pipeline import gpipe

        mesh_, axis_, micro = pp_ctx
        assert len(params["blocks"]) == mesh_.shape[axis_], (
            f"pipeline_blocks needs num_blocks == mesh['{axis_}'] "
            f"({len(params['blocks'])} vs {mesh_.shape[axis_]})"
        )
        stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *params["blocks"])
        micro_eff = micro if b % micro == 0 else math.gcd(b, micro)
        # compose PP with DP: shard the microbatch batch dim over the data
        # axis when present, so data rows don't redundantly recompute every
        # microbatch (gpipe replicates x otherwise)
        batch_ax = None
        if "data" in mesh_.axis_names and mesh_.shape["data"] > 1 \
                and (b // micro_eff) % mesh_.shape["data"] == 0:
            batch_ax = "data"
        # gpipe calls stage_fn(p, x) when aux is None and (p, x, aux)
        # otherwise — accept both arities
        x = gpipe(
            lambda p, xx, te=None: vit_block_apply(p, cfg.block_cfg, xx, time_embedding=te),
            stacked, x, mesh_, axis=axis_,
            num_microbatches=micro_eff, aux=time_emb, batch_axis=batch_ax,
        )
    else:
        for block in params["blocks"]:
            x = vit_block_apply(block, cfg.block_cfg, x, time_embedding=time_emb)

    x = mp.layer_norm_apply(params["norm"], x)
    x = mp.mp_conv_apply(params["unpatch_proj"], x.reshape(b * cfg.seq_ln, cfg.emb_dim))
    x = x.reshape(b, hp, wp, c * p * p)
    x = mp.pixel_shuffle(x, p)
    if pad_h or pad_w:
        x = x[:, :orig_h, :orig_w, :]
    return x
