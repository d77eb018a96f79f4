"""Pallas stride-1 'same' convolution with VMEM-resident im2col.

Why this kernel exists (measured, artifacts/profile_r2/conv_layout2.json):
XLA:TPU lowers these convs through an HBM-materialized patch matrix — conv
wall time tracks the k^2-amplified patch traffic, not FLOPs (the 151-MFLOP
32-channel 3x3 conv runs at 8.7 TF/s while a matmul of identical shape runs
at 38 TF/s). Here the patch matrix is built INSIDE VMEM from k*k
statically-shifted copies of the (C, H*W) image, so HBM sees only the
activation in and out, and the single (kh*kw*C, HW)-by-(kh*kw*C, O) matmul
runs at the transposed-matmul roofline (tokens on the MXU lanes).

Layout notes (Mosaic): activations stream in pre-flattened as (B, C, H*W) —
an in-kernel (C, H, W) -> (C, H*W) reshape is an unsupported sublane->lane
shape cast ("infer-vector-layout" error on real TPU), while the outside
reshape is metadata-only in row-major. The 2D spatial shifts become flat
lane rolls with iota masks killing row-wrap contamination and edge padding.

Replaces the hot expert/projection convs of the reference denoiser
(/root/reference/models/model_internals.py:240-275) when
HDMOEMConfig.conv_impl == "pallas"; ops/mp.py:mp_conv_apply routes here and
falls back to the XLA conv outside this kernel's scope (stride != 1, even
kernels, lane-unfriendly spatial sizes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _shift_flat(xf: jnp.ndarray, oy: int, ox: int, w: int) -> jnp.ndarray:
    """out[c, i*w+j] = x[c, (i+oy)*w + (j+ox)], zero outside the image.

    ``xf`` is (C, H*W) row-major; the roll crosses row boundaries, so column
    validity is masked with a lane iota (rows wrapping past either end are
    masked by the flat-range check)."""
    hw = xf.shape[1]
    s = oy * w + ox
    rolled = jnp.roll(xf, -s, axis=1) if s != 0 else xf
    j = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
    valid = (j + s >= 0) & (j + s < hw)
    if ox != 0:
        col = jax.lax.rem(j, w)
        valid &= (col + ox >= 0) & (col + ox < w)
    return jnp.where(valid, rolled, jnp.zeros_like(rolled))


def _conv_same_kernel(*refs, kh, kw, img_w, silu, with_scale):
    if with_scale:
        x_ref, w_ref, s_ref, o_ref = refs
    else:
        x_ref, w_ref, o_ref = refs
        s_ref = None
    x = x_ref[0]  # (C, H*W)
    if with_scale:
        # per-(image, channel) modulation: (C, 1) broadcast over the lanes
        x = x * s_ref[0].astype(x.dtype)
    if silu:
        # mp_silu prologue (ops/mp.py:96), computed in x.dtype exactly like
        # the unfused op; fused in VMEM so the XLA producer fusion the
        # pallas_call would otherwise break is recovered inside the kernel.
        # Plain exp-based sigmoid: both jax.nn.silu (custom_jvp) and
        # lax.logistic fail Mosaic lowering on real TPU (KeyError
        # ('closed_call', silu jaxpr) out of the MLIR lowering cache);
        # exp is the one transcendental the flash kernels already prove out.
        x = x * (1.0 / (1.0 + jnp.exp(-x))) / 0.596
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            cols.append(_shift_flat(x, dy - ph, dx - pw, img_w))
    pat = jnp.concatenate(cols, axis=0)  # (kh*kw*C, HW) — sublane-major taps
    # out^T (O, HW): contract the tap axis (sublanes of both operands)
    out = jax.lax.dot_general(w_ref[...], pat, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def supported(x_shape, w_shape, stride: int) -> bool:
    """Scope gate: stride-1 odd square kernels on lane-aligned spatial with
    sublane-tileable input channels (C % 16: the kernel concatenates k*k
    (C, HW) pieces along sublanes — sub-granule offsets hit Mosaic's
    'Sublane broadcast: not implemented' on real TPU at C=4), restricted to
    the classes where it measured faster than the XLA conv
    (artifacts/profile_r2/conv_layout3.json): big spatial (HW >= 1024,
    where XLA's HBM patch traffic dominates) or 5x5 taps (25x
    amplification); small-spatial 3x3 convs stay XLA (6.0 us vs 7.3)."""
    if stride != 1 or len(w_shape) != 4:
        return False
    _, h, w, _ = x_shape
    o, c, kh, kw = w_shape
    return (kh == kw and kh % 2 == 1 and kh > 1
            and c % 16 == 0
            and (h * w) % 128 == 0
            and (h * w >= 1024 or kh >= 5) and h * w >= 256)


def conv_same(x: jnp.ndarray, w: jnp.ndarray,
              interpret: Optional[bool] = None,
              *, silu: bool = False,
              scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """NHWC stride-1 'same' conv, OIHW weights — drop-in for the XLA conv.

    ``silu=True`` fuses the mp_silu prologue; ``scale`` (B, C) fuses a
    per-(image, channel) modulation applied BEFORE the silu — together they
    cover the U-Net block's ``conv(mp_silu(x))`` and
    ``conv(mp_silu(x * emb))`` patterns (model_components.py:238-246)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, wd, c = x.shape
    o, _, kh, kw = w.shape
    # (kh, kw, C, O) rows match the kernel's (dy, dx, c) tap order.
    wmat = jnp.transpose(w, (2, 3, 1, 0)).reshape(kh * kw * c, o).astype(x.dtype)
    xn = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, h * wd)
    in_specs = [
        pl.BlockSpec((1, c, h * wd), lambda i: (i, 0, 0)),
        pl.BlockSpec((kh * kw * c, o), lambda i: (0, 0)),
    ]
    operands = [xn, wmat]
    if scale is not None:
        # (B, C, 1): a trailing singleton keeps the block's last-two dims
        # legal ((C, 1): C%8 via the C%16 gate, 1 == array dim) — a flat
        # (1, C) block fails the (8, 128) divisibility check on real TPU.
        in_specs.append(pl.BlockSpec((1, c, 1), lambda i: (i, 0, 0)))
        operands.append(scale.astype(x.dtype)[:, :, None])
    out = pl.pallas_call(
        functools.partial(_conv_same_kernel, kh=kh, kw=kw, img_w=wd,
                          silu=silu, with_scale=scale is not None),
        out_shape=jax.ShapeDtypeStruct((b, o, h * wd), x.dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, o, h * wd), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(*operands)
    return jnp.transpose(out.reshape(b, o, h, wd), (0, 2, 3, 1))
