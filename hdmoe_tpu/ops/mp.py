"""Magnitude-preserving primitives (EDM2-style), TPU-native.

Pure-JAX re-design of the reference primitive layer
(/root/reference/models/model_internals.py:8-275). Differences from the
reference are deliberate TPU-first choices, not omissions:

- Image tensors are NHWC (TPU conv layout), not NCHW.
- ``MP_Conv``'s training-time in-place weight re-projection
  (model_internals.py:254-256) becomes a pure parameter projection applied in
  the optimizer update (see train/optim.py:project_mp_weights); the forward
  always normalizes weights at use, which composes to the same math.
- ``resample`` (model_internals.py:95-127) with the default [1,1] filter is
  exactly 2x2 mean-pool (down) / 2x2 nearest repeat (up); we implement those
  directly with reshapes instead of grouped (transposed) convolutions — same
  values, far cheaper on TPU.
- RNG is threaded explicitly via jax.random keys.

Parameters are plain nested dicts of jnp arrays. MP-normalized weights are
stored under the key ``"mpw"`` so the optimizer-side projection can find them
generically.
"""

from __future__ import annotations

import contextlib
import contextvars
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Trace-time switch: inside ``prenormalized_weights()`` MP convs skip the
# normalize-at-use step (the caller guarantees weights are already projected,
# e.g. via train.optim.project_mp_weights before a sampling loop). Saves one
# reduction per conv per denoiser eval — 35x per sampled image at 35 NFE.
# ContextVars, not module globals: concurrent traces (e.g. the serve
# frontend AOT-compiling while a training trace runs in another thread)
# must not leak trace-time config into each other.
_WEIGHTS_PRENORMALIZED = contextvars.ContextVar("mp_weights_prenormalized", default=False)


@contextlib.contextmanager
def prenormalized_weights():
    tok = _WEIGHTS_PRENORMALIZED.set(True)
    try:
        yield
    finally:
        _WEIGHTS_PRENORMALIZED.reset(tok)


# Trace-time switch for the conv lowering. "xla" is lax.conv_general_dilated
# on NHWC activations; "im2col_t" lowers stride-1 convs to an explicit
# transposed im2col matmul  out^T = W(O, C*kh*kw) @ patches(C*kh*kw, tokens)
# so the large token dimension sits on the MXU lanes — the XLA conv puts the
# output channels there, capping lane use at O/128 for the small-O convs
# (O in {4, 32, 64}) that dominate the flagship denoiser (PERF.md).
_CONV_IMPL = contextvars.ContextVar("mp_conv_impl", default="xla")


@contextlib.contextmanager
def conv_layout(impl: str):
    assert impl in ("xla", "im2col_t", "pallas"), impl
    tok = _CONV_IMPL.set(impl)
    try:
        yield
    finally:
        _CONV_IMPL.reset(tok)

# ---------------------------------------------------------------------------
# Stateless magnitude-preserving ops
# ---------------------------------------------------------------------------


def normalize(x: jnp.ndarray, axis: Optional[Sequence[int]] = None, eps: float = 1e-4) -> jnp.ndarray:
    """Project ``x`` onto the unit-RMS hypersphere.

    Matches reference ``normalize`` (model_internals.py:8-30): the divisor is
    ``eps + ||x||_2 * sqrt(n_reduced_elems^-1)`` i.e. ``eps + RMS(x)`` computed
    in float32, reducing over ``axis`` (default: all but the leading dim).
    """
    if axis is None:
        axis = tuple(range(1, x.ndim))
    else:
        axis = tuple(a % x.ndim for a in axis)
    x32 = x.astype(jnp.float32)
    n = 1
    for a in axis:
        n *= x.shape[a]
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=True))
    w = eps + norm * (1.0 / math.sqrt(n))
    return (x32 / w).astype(x.dtype)


def mp_silu(x: jnp.ndarray) -> jnp.ndarray:
    """Variance-restoring SiLU: ``silu(x)/0.596`` (model_internals.py:33-47)."""
    return jax.nn.silu(x) / 0.596


def mp_sum(a: jnp.ndarray, b: jnp.ndarray, t: float = 0.5) -> jnp.ndarray:
    """Magnitude-preserving lerp: ``lerp(a,b,t)/sqrt((1-t)^2+t^2)``.

    Matches model_internals.py:50-66. ``t`` may be a python float or a traced
    scalar (e.g. a learnable balance).
    """
    denom = jnp.sqrt((1.0 - t) ** 2 + t**2)
    return (a + (b - a) * t) / denom


def mp_cat(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1, t: float = 0.5) -> jnp.ndarray:
    """Magnitude-preserving concatenation (model_internals.py:69-92).

    Per-branch weights ``Wa = c(1-t)/sqrt(Na)``, ``Wb = c t/sqrt(Nb)`` with
    ``c = sqrt((Na+Nb)/((1-t)^2+t^2))``. Default axis is -1 (channels in NHWC),
    where the reference default was 1 (channels in NCHW).
    """
    na = a.shape[axis]
    nb = b.shape[axis]
    c1 = math.sqrt((na + nb) / ((1.0 - t) ** 2 + t**2))
    wa = c1 * (1.0 - t) / math.sqrt(na)
    wb = c1 * t / math.sqrt(nb)
    return jnp.concatenate([wa * a, wb * b], axis=axis)


def resample(x: jnp.ndarray, mode: str = "keep") -> jnp.ndarray:
    """Spatial 2x resampling of an NHWC tensor (model_internals.py:95-127).

    With the reference's default filter ``f=[1,1]`` the grouped conv collapses
    to a 2x2 mean-pool (``down``) and the transposed conv (``kernel*4``) to a
    2x2 nearest-neighbour repeat (``up``); we compute those forms directly.
    """
    if mode == "keep":
        return x
    b, h, w, c = x.shape
    if mode == "down":
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
    if mode == "up":
        x = x[:, :, None, :, None, :]
        x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
        return x.reshape(b, h * 2, w * 2, c)
    raise ValueError(f"Invalid mode: {mode}")


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """PixelShuffle on NHWC input with torch channel ordering.

    ``out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j]`` — matches
    ``nn.PixelShuffle`` (used by the ViT expert unpatchify,
    model_components.py:647) transposed to NHWC.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def dropout(x: jnp.ndarray, rate: float, key: Optional[jax.Array], train: bool) -> jnp.ndarray:
    """Inverted dropout matching ``F.dropout`` semantics."""
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# MP Fourier features
# ---------------------------------------------------------------------------


def mp_fourier_init(key: jax.Array, num_channels: int, bandwidth: float = 1.0) -> dict:
    """Random Fourier features (model_internals.py:130-175).

    ``freqs = 2*pi*randn(n)*bandwidth``, ``phases = 2*pi*rand(n)`` — fixed
    (non-trainable) buffers.
    """
    k1, k2 = jax.random.split(key)
    return {
        "freqs": 2.0 * jnp.pi * jax.random.normal(k1, (num_channels,)) * bandwidth,
        "phases": 2.0 * jnp.pi * jax.random.uniform(k2, (num_channels,)),
    }


def mp_fourier_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """``sqrt(2) * cos(x ⊗ freqs + phases)``; x strictly shaped (B,)."""
    y = x.astype(jnp.float32)
    y = y[:, None] * params["freqs"][None, :].astype(jnp.float32)
    y = y + params["phases"][None, :].astype(jnp.float32)
    return (jnp.cos(y) * math.sqrt(2.0)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Sinusoidal positional encoding (reference Pos_encoding; unused by the model
# but part of the public primitive surface, model_internals.py:178-206)
# ---------------------------------------------------------------------------


def pos_encoding_init(key: jax.Array, emb_dim: int = 512, freq_emb_dim: int = 256, max_period: int = 10000) -> dict:
    assert freq_emb_dim % 2 == 0
    half = freq_emb_dim // 2
    k1, k2 = jax.random.split(key)
    freq = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    # Two-layer MLP with torch nn.Linear default init (uniform +-1/sqrt(fan_in)).
    lim1 = 1.0 / math.sqrt(freq_emb_dim)
    lim2 = 1.0 / math.sqrt(emb_dim)
    k1a, k1b = jax.random.split(k1)
    k2a, k2b = jax.random.split(k2)
    return {
        "freq": freq,
        "w1": jax.random.uniform(k1a, (emb_dim, freq_emb_dim), minval=-lim1, maxval=lim1),
        "b1": jax.random.uniform(k1b, (emb_dim,), minval=-lim1, maxval=lim1),
        "w2": jax.random.uniform(k2a, (emb_dim, emb_dim), minval=-lim2, maxval=lim2),
        "b2": jax.random.uniform(k2b, (emb_dim,), minval=-lim2, maxval=lim2),
    }


def pos_encoding_apply(params: dict, time_vec: jnp.ndarray) -> jnp.ndarray:
    t = time_vec.reshape(-1).astype(jnp.float32)
    args = t[:, None] * params["freq"][None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = emb @ params["w1"].T + params["b1"]
    h = jax.nn.silu(h)
    return h @ params["w2"].T + params["b2"]


# ---------------------------------------------------------------------------
# MP Conv / Linear
# ---------------------------------------------------------------------------


def mp_conv_init(key: jax.Array, in_channels: int, out_channels: int, kernel: Tuple[int, ...] = ()) -> dict:
    """Unified MP linear/conv weights (model_internals.py:209-238).

    ``kernel=()`` gives a linear layer with weight (out, in); ``kernel=(kh,kw)``
    a conv with weight (out, in, kh, kw) (OIHW — kept torch-ordered so
    checkpoints are portable; the conv call maps it onto NHWC activations).
    Weights init to standard normal — scale is irrelevant since forward
    normalizes.
    """
    w = jax.random.normal(key, (out_channels, in_channels, *kernel), dtype=jnp.float32)
    assert w.size > 0, "MP conv/linear weights must be non-empty (model_internals.py:236)"
    return {"mpw": w}


def _mp_weight(params: dict, gain) -> jnp.ndarray:
    w = params["mpw"].astype(jnp.float32)
    if not _WEIGHTS_PRENORMALIZED.get():
        w = normalize(w)
    fan_in = 1
    for d in w.shape[1:]:
        fan_in *= d
    return w * (gain / math.sqrt(fan_in))


def mp_linear_apply_t(params: dict, x: jnp.ndarray, gain=1.0) -> jnp.ndarray:
    """Transposed MP linear: x (B, L, Cin) -> (B, Cout, L).

    Identical math to :func:`mp_conv_apply`'s 2-D path, but with the output
    feature axis MAJOR. On TPU the matmul's natural output layout is
    L-minor; asking for (B, L, Cout) and then head-splitting to (B, H, L, d)
    for the flash kernel forces XLA to materialize a {2,1,3,0}->{3,2,1,0}
    layout copy at 8-byte run granularity (~1.6 ms per 32 MB at batch 512 —
    artifacts/profile_r3_b512). This output feeds flash_attention_t as a
    free (B, H, d, L) bitcast instead.
    """
    w = _mp_weight(params, gain).astype(x.dtype)  # (out, in)
    return jnp.einsum("ble,oe->bol", x, w)


def mp_linear_consume_t(params: dict, x_t: jnp.ndarray, gain=1.0) -> jnp.ndarray:
    """MP linear consuming a transposed operand: x_t (B, Cin, L) -> (B, L, Cout).

    The inverse boundary of :func:`mp_linear_apply_t`: contracts the major
    feature axis of a transposed activation directly, so the attention
    output projection reads the flash_attention_t output without a layout
    copy and re-enters the (B, L, C) residual-stream world.
    """
    w = _mp_weight(params, gain).astype(x_t.dtype)  # (out, in)
    return jnp.einsum("bil,oi->blo", x_t, w)


def mp_conv_apply(params: dict, x: jnp.ndarray, gain=1.0, stride: int = 1) -> jnp.ndarray:
    """Forward of MP conv/linear (model_internals.py:240-275).

    2-D input -> linear; 4-D NHWC input -> conv2d. Stride-1 convs use the
    reference's manual asymmetric 'same' padding (low = (k-1)//2,
    high = (k-1) - (k-1)//2); stride>1 uses symmetric ``k//2``.
    """
    w = _mp_weight(params, gain).astype(x.dtype)
    if x.ndim == 2:
        return x @ w.T
    assert x.ndim == 4, f"MP conv expects 2-D or 4-D input, got {x.shape}"
    kh, kw = w.shape[-2], w.shape[-1]
    if stride == 1:
        pad_h = (kh - 1) // 2, (kh - 1) - (kh - 1) // 2
        pad_w = (kw - 1) // 2, (kw - 1) - (kw - 1) // 2
    else:
        pad_h = (kh // 2, kh // 2)
        pad_w = (kw // 2, kw // 2)
    if _CONV_IMPL.get() == "im2col_t":
        return _conv_im2col_t(x, w, stride, pad_h, pad_w)
    if _CONV_IMPL.get() == "pallas" and _pallas_backend_ok():
        from hdmoe_tpu.ops.pallas import conv as pallas_conv

        if pallas_conv.supported(x.shape, w.shape, stride):
            return _pallas_conv_ad(x, w)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )


def _pallas_backend_ok() -> bool:
    """The Pallas conv route runs compiled on TPU and interpreted under the
    CPU test backend; any other backend (e.g. GPU) falls back to the XLA
    conv — the interpreter there would be orders of magnitude slower."""
    return jax.default_backend() in ("tpu", "cpu")


def _xla_same_conv(x, w):
    """The stride-1 'same' XLA conv (odd kernels), used as the AD reference
    for the Pallas forward."""
    kh, kw = w.shape[-2], w.shape[-1]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    return lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "OIHW", "NHWC"))


@jax.custom_vjp
def _pallas_conv_ad(x, w):
    from hdmoe_tpu.ops.pallas import conv as pallas_conv

    return pallas_conv.conv_same(x, w)


def _pallas_conv_fwd(x, w):
    return _pallas_conv_ad(x, w), (x, w)


def _pallas_conv_bwd(res, g):
    # Exact grads via the XLA conv's own VJP (the Pallas forward computes the
    # identical function). The backward stays XLA: sampling — the hot path
    # this kernel exists for — never differentiates.
    x, w = res
    _, vjp = jax.vjp(_xla_same_conv, x, w)
    return vjp(g)


_pallas_conv_ad.defvjp(_pallas_conv_fwd, _pallas_conv_bwd)


def mp_conv_silu_apply(
    params: dict,
    x: jnp.ndarray,
    gain=1.0,
    scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``mp_conv(mp_silu(x * scale))`` with the prologue FUSED into the
    Pallas conv under ``conv_layout("pallas")`` (profile_r2b: the plain
    pallas conv measured neutral in-model because the pallas_call breaks
    XLA's elementwise-producer fusion — this restores it in VMEM).

    ``scale`` is an optional per-(batch, channel) modulation (the U-Net
    block's ``* (1 + emb)``, model_components.py:238-241). Identical math
    to the unfused path on any impl/shape outside the kernel's scope.
    Forward-only fusion: under differentiation the unfused ops are used
    (sampling is the hot path; XLA fuses fine in the training graph)."""
    from hdmoe_tpu.ops.pallas import conv as pallas_conv

    w = _mp_weight(params, gain).astype(x.dtype)
    if (_CONV_IMPL.get() == "pallas" and _pallas_backend_ok() and x.ndim == 4
            and pallas_conv.supported(x.shape, w.shape, 1)):
        return _pallas_conv_silu_ad(x, w, scale)
    if scale is not None:
        x = x * scale[:, None, None, :].astype(x.dtype)
    return mp_conv_apply(params, mp_silu(x), gain=gain)


def _unfused_conv_silu(x, w, scale):
    if scale is not None:
        x = x * scale[:, None, None, :].astype(x.dtype)
    return _xla_same_conv(mp_silu(x), w)


@jax.custom_vjp
def _pallas_conv_silu_ad(x, w, scale):
    from hdmoe_tpu.ops.pallas import conv as pallas_conv

    return pallas_conv.conv_same(x, w, silu=True, scale=scale)


def _pallas_conv_silu_fwd(x, w, scale):
    return _pallas_conv_silu_ad(x, w, scale), (x, w, scale)


def _pallas_conv_silu_bwd(res, g):
    x, w, scale = res
    if scale is None:
        _, vjp = jax.vjp(lambda x_, w_: _unfused_conv_silu(x_, w_, None), x, w)
        dx, dw = vjp(g)
        return dx, dw, None
    _, vjp = jax.vjp(_unfused_conv_silu, x, w, scale)
    return vjp(g)


_pallas_conv_silu_ad.defvjp(_pallas_conv_silu_fwd, _pallas_conv_silu_bwd)


def _conv_im2col_t(x, w, stride, pad_h, pad_w):
    """Transposed im2col conv: one (O, C*kh*kw) @ (C*kh*kw, tokens) matmul
    per image, tokens on the MXU lanes (see ``conv_layout``). Same math as
    the XLA conv (patch features are channel-major, matching OIHW)."""
    b = x.shape[0]
    o, kh, kw = w.shape[0], w.shape[-2], w.shape[-1]
    xn = jnp.transpose(x, (0, 3, 1, 2))
    p = lax.conv_general_dilated_patches(
        xn, (kh, kw), (stride, stride), (pad_h, pad_w),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (B, C*kh*kw, Ho, Wo)
    ho, wo = p.shape[2], p.shape[3]
    p = p.reshape(b, p.shape[1], ho * wo)
    y = jnp.einsum("ok,bkn->bon", w.reshape(o, -1), p,
                   preferred_element_type=jnp.float32)
    return jnp.transpose(y.astype(x.dtype).reshape(b, o, ho, wo), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Norm layers (torch-semantics GroupNorm / LayerNorm; used by routers and ViT
# blocks, model_components.py:32,102,491,495)
# ---------------------------------------------------------------------------


def group_norm_init(num_channels: int) -> dict:
    return {
        "scale": jnp.ones((num_channels,), dtype=jnp.float32),
        "bias": jnp.zeros((num_channels,), dtype=jnp.float32),
    }


def group_norm_apply(
    params: dict, x: jnp.ndarray, num_groups: int, eps: float = 1e-5, channel_axis: int = -1
) -> jnp.ndarray:
    """GroupNorm with torch semantics: stats per (batch, group) over the group's
    channels and all non-batch spatial dims; affine per channel.

    ``channel_axis=-1`` for NHWC / (B, L, C) activations. Stats in float32;
    output keeps the input dtype (mixed-precision safe).
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    ca = channel_axis % x.ndim
    c = x.shape[ca]
    g = num_groups
    # Move channels last, flatten spatial.
    perm = [i for i in range(x.ndim) if i != ca] + [ca]
    inv_perm = [perm.index(i) for i in range(x.ndim)]
    xt = x.transpose(perm)  # (..., C)
    lead = xt.shape[:-1]
    b = lead[0]
    xt = xt.reshape(b, -1, g, c // g)  # (B, spatial, G, C/G)
    mean = xt.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xt - mean), axis=(1, 3), keepdims=True)
    xt = (xt - mean) * lax.rsqrt(var + eps)
    xt = xt.reshape(b, *lead[1:], c)
    xt = xt * params["scale"] + params["bias"]
    return xt.transpose(inv_perm).astype(orig_dtype)


def layer_norm_init(dim: int) -> dict:
    return {
        "scale": jnp.ones((dim,), dtype=jnp.float32),
        "bias": jnp.zeros((dim,), dtype=jnp.float32),
    }


def layer_norm_apply(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(orig_dtype)
