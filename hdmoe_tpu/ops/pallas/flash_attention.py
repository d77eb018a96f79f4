"""Blocked (flash) attention Pallas TPU kernel with optional additive bias.

The memory-bound core of MP attention (ops/attention.py): computes
``softmax(Q K^T / sqrt(d) + bias) V`` without materializing the (Lq, Lk)
score matrix in HBM — scores live in VMEM one (block_q, block_k) tile at a
time with the standard online-softmax recurrence (running max m, running
denominator l, rescaled accumulator).

Design notes (see /opt/skills/guides/pallas_guide.md):
- grid = (B*H, Lq/block_q, Lk/block_k); the kv axis is the innermost grid
  dimension so the VMEM scratch (m, l, acc) carries across kv blocks of one
  (bh, q-block) and resets at j == 0.
- bias is a separate kernel variant — a bias-free call moves zero extra HBM
  bytes (an explicit zero-bias operand would add O(Lq*Lk) traffic and
  dominate at long sequence).
- kv padding (Lk not a block multiple) is masked in-kernel with an iota
  compare, not a bias tensor.
- head_dim pads to the 128 lane width only when smaller; fp32 accumulation
  regardless of input dtype.

Differentiation: ``flash_attention`` carries a custom VJP whose backward
pass recomputes attention with plain XLA ops (identical math) and
differentiates that — the forward gets the fused kernel, the backward stays
exact; a hand-written backward kernel lands with the training-path
optimization pass.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attention_reference(q, k, v, bias):
    """XLA reference: identical math, used for the VJP and numerics tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(d)
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _kernel_body(s, v, j, nk, o_ref, m_scr, l_scr, acc_scr, kv_len, block_k):
    """Shared online-softmax update given the (block_q, block_k) scores."""
    # Mask kv padding on the last block.
    if kv_len % block_k != 0:
        valid = kv_len - j * block_k  # traced
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid, s, _NEG_INF)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[...] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)


def _make_kernel(sm_scale, kv_len, block_k, with_bias):
    def kernel(*refs):
        if with_bias:
            q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr = refs
        else:
            q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
        j = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # Matmuls run in the INPUT dtype with fp32 accumulation (the MXU
        # accumulates bf16 products in fp32 natively): casting operands to
        # fp32 here quarters the MXU rate for bf16 activations (measured —
        # the round-1 "flash neutral at the flagship" finding).
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * sm_scale
        if with_bias:
            s = s + bias_ref[0].astype(jnp.float32)
        _kernel_body(s, v, j, nk, o_ref, m_scr, l_scr, acc_scr, kv_len, block_k)

    return kernel


def _pad_axis(x, axis, mult):
    size = x.shape[axis]
    pad = (mult - size % mult) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_forward(q, k, v, bias, *, block_q: int, block_k: int, interpret: bool):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # Small-head single-pass specialization (see _smallhead_kernel): softmax
    # reductions over sublanes, whole K/V resident in VMEM, no online
    # recurrence. The regime where the blocked kernel is VPU-bound.
    if d <= 32 and lk <= 4096:
        return _smallhead_forward(
            q, k, v, bias, block_q=min(block_q, 256 if lk <= 2048 else 128),
            interpret=interpret)
    sm_scale = 1.0 / math.sqrt(d)

    # Tiny head dims pad only to the 16-lane packing granule (zero columns
    # are inert; Mosaic pads the lane axis internally). Padding all the way
    # to 128 multiplies the QK^T/AV DMA bytes by 128/d and drags dead lanes
    # through every pass — at the flagship's d=4 that made flash merely
    # neutral vs the HBM-bound XLA path.
    if d % 16 != 0:
        dp = ((d + 15) // 16) * 16
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    else:
        dp = d

    block_q = max(8, min(block_q, lq))
    block_k = max(8, min(block_k, lk))
    q = _pad_axis(q, 2, block_q)
    k = _pad_axis(k, 2, block_k)
    v = _pad_axis(v, 2, block_k)
    lqp, lkp = q.shape[2], k.shape[2]

    bh = b * h
    qr = q.reshape(bh, lqp, dp)
    kr = k.reshape(bh, lkp, dp)
    vr = v.reshape(bh, lkp, dp)

    grid = (bh, lqp // block_q, lkp // block_k)
    with_bias = bias is not None
    kernel = _make_kernel(sm_scale, lk, block_k, with_bias)

    in_specs = [
        pl.BlockSpec((1, block_q, dp), lambda bhi, i, j: (bhi, i, 0)),
        pl.BlockSpec((1, block_k, dp), lambda bhi, i, j: (bhi, j, 0)),
        pl.BlockSpec((1, block_k, dp), lambda bhi, i, j: (bhi, j, 0)),
    ]
    operands = [qr, kr, vr]
    if with_bias:
        bias_h = bias.shape[0]
        bias_p = _pad_axis(_pad_axis(bias.astype(jnp.float32), 1, block_q), 2, block_k)
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, block_k),
                (lambda bhi, i, j: (bhi % bias_h, i, j)) if bias_h > 1 else (lambda bhi, i, j: (0, i, j)),
            )
        )
        operands.append(bias_p)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, lqp, dp), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bhi, i, j: (bhi, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    return out.reshape(b, h, lqp, dp)[:, :, :lq, :d]


# ---------------------------------------------------------------------------
# Small-head specialization: scores transposed to (Lk, Lq).
#
# At tiny head dims (the flagship fusion attention: d=4, L=1024) the blocked
# online-softmax kernel is VPU-bound, not MXU-bound — and its row reductions
# (max/sum over the LANE axis) plus the per-kv-block rescale are the cost.
# This kernel computes s^T = K q^T so the softmax reduction runs over the
# SUBLANE axis (a native VPU reduction), holds ALL of K/V for one (b, h) in
# VMEM (fits comfortably for Lk <= ~2048 at small d), and therefore needs no
# online recurrence at all: one exp, two sublane reductions, two matmuls.
# ---------------------------------------------------------------------------


def _smallhead_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, kv_len):
    q = q_ref[0]  # (block_q, dp)
    k = k_ref[0]  # (Lk_pad, dp)
    v = v_ref[0]  # (Lk_pad, dp)
    # s^T: (Lk_pad, block_q) — contraction over d on the MXU
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    st = st * sm_scale
    if st.shape[0] != kv_len:  # mask kv padding rows
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(row < kv_len, st, _NEG_INF)
    m = jnp.max(st, axis=0, keepdims=True)  # sublane reduction
    p = jnp.exp(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    # out^T = V^T P : contract Lk (sublane axis of both) -> (dp, block_q)
    ot = jax.lax.dot_general(v, p.astype(v.dtype), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (ot / l).astype(o_ref.dtype)


def _smallhead_bias_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale, kv_len):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    st = st * sm_scale + bias_ref[0].astype(jnp.float32)  # bias pre-transposed (Lk, Lq)
    if st.shape[0] != kv_len:
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(row < kv_len, st, _NEG_INF)
    m = jnp.max(st, axis=0, keepdims=True)
    p = jnp.exp(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    ot = jax.lax.dot_general(v, p.astype(v.dtype), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (ot / l).astype(o_ref.dtype)


def _smallhead_forward(q, k, v, bias, *, block_q: int, interpret: bool):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    sm_scale = 1.0 / math.sqrt(d)

    # No d-padding: a trailing block dim equal to the full array dim is
    # legal at any size, and the jnp.pad HBM round-trips measured ~12% of
    # the kernel wall at d=4 (artifacts/profile_r2/attn_variants.json:
    # nopad 1.17 vs padded 1.33 ms; bf16-exp measured slower — exp is only
    # ~9% of the kernel, the noexp control ran 1.07).
    dp = d
    block_q = max(8, min(block_q, lq))
    q = _pad_axis(q, 2, block_q)
    k = _pad_axis(k, 2, 16)  # sublane granule (bf16 packing)
    v = _pad_axis(v, 2, 16)
    lqp, lkp = q.shape[2], k.shape[2]
    bh = b * h
    qr = q.reshape(bh, lqp, dp)
    kr = k.reshape(bh, lkp, dp)
    vr = v.reshape(bh, lkp, dp)

    grid = (bh, lqp // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, dp), lambda bhi, i: (bhi, i, 0)),
        pl.BlockSpec((1, lkp, dp), lambda bhi, i: (bhi, 0, 0)),
        pl.BlockSpec((1, lkp, dp), lambda bhi, i: (bhi, 0, 0)),
    ]
    operands = [qr, kr, vr]
    if bias is not None:
        bias_h = bias.shape[0]
        # transpose to (H, Lk, Lq): the kernel's scores live transposed
        bias_t = _pad_axis(_pad_axis(jnp.swapaxes(bias, 1, 2).astype(jnp.float32), 1, 16), 2, block_q)
        in_specs.append(
            pl.BlockSpec(
                (1, lkp, block_q),
                (lambda bhi, i: (bhi % bias_h, 0, i)) if bias_h > 1 else (lambda bhi, i: (0, 0, i)),
            )
        )
        operands.append(bias_t)
        kernel = functools.partial(_smallhead_bias_kernel, sm_scale=sm_scale, kv_len=lk)
    else:
        kernel = functools.partial(_smallhead_kernel, sm_scale=sm_scale, kv_len=lk)

    # output transposed per block: (bh, dp, lqp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, dp, lqp), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, dp, block_q), lambda bhi, i: (bhi, 0, i)),
        interpret=interpret,
    )(*operands)
    return jnp.swapaxes(out.reshape(b, h, dp, lqp), 2, 3)[:, :, :lq, :d]


# ---------------------------------------------------------------------------
# Fused backward (bias-free path).
#
# Standard flash backward with the per-row logsumexp RECOMPUTED by a cheap
# dedicated kernel (one extra QK^T pass — keeps the forward kernels'
# signatures untouched), then two accumulation kernels:
#   dV = P^T dO,  dS = P o (dO V^T - D),  dK = dS^T Q * scale,
#   dQ = dS K * scale,   with D = rowsum(dO o O), P = exp(S*scale - lse).
# All kernels use the transposed (block_k, block_q) score orientation so the
# broadcasts/reductions ride the sublane axis; matmuls run in the input
# dtype with fp32 accumulation.
#
# Biased self-attention (the TMSA rel-pos path) keeps the XLA recompute
# fallback: its bias gradient is a dense (H, Lq, Lk) tensor — materializing
# it erases the memory win, and the TMSA sequences (<= (res/patch)^2) are
# short enough for XLA. The long-sequence training path that matters
# (text_guided_64's seq-4096 fusion cross-attention) is bias-free.
# ---------------------------------------------------------------------------


def _smallhead_bwd_kernel(q_ref, k_ref, v_ref, dot_ref, ot_ref, dq_ref, dk_ref, dv_ref,
                          dk_scr, dv_scr, *, sm_scale, kv_len):
    """Single-pass transposed backward (see _smallhead_backward).

    Scores live (Lk, block_q) like the small-head forward, so softmax and the
    D = rowsum(dO o O) reduction both ride the sublane axis; dO/O arrive
    PRE-TRANSPOSED (dp, block_q) to make that native. K/V (and the dk/dv
    fp32 accumulators) stay VMEM-resident across the whole q sweep of one
    (b, h) — lse is re-derived from the in-VMEM scores, so there is no
    separate lse pass, no D pass, and no dq pass: one kernel, grid (bh, nq),
    versus the generic 3-pass x (bh, nq, nk) pipeline whose per-block work at
    tiny d is dwarfed by grid/DMA overhead (measured 231 ms vs 42 ms dense on
    the text_guided_64 train step before this kernel existed)."""
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]      # (block_q, dp)
    k = k_ref[0]      # (Lk_pad, dp)
    v = v_ref[0]      # (Lk_pad, dp)
    dot_ = dot_ref[0]  # (dp, block_q) = dO^T
    ot = ot_ref[0]     # (dp, block_q) = O^T
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * sm_scale  # (Lk, bq)
    if st.shape[0] != kv_len:
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(row < kv_len, st, _NEG_INF)
    # lse first, then ONE normalized exp — keeps a single (Lk, bq) fp32
    # probability buffer live instead of p and p/l side by side (scoped
    # VMEM is the binding constraint at Lk=4096).
    m = jnp.max(st, axis=0, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(st - m), axis=0, keepdims=True))
    pn = jnp.exp(st - lse)  # P^T, normalized (Lk, bq)
    pnl = pn.astype(v.dtype)
    # dV = P^T dO: contract block_q (lanes of both pn and dO^T)
    dv_scr[...] += jax.lax.dot_general(pnl, dot_, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    # (dP)^T = V dO^T
    dpt = jax.lax.dot(v, dot_, preferred_element_type=jnp.float32)  # (Lk, bq)
    drow = jnp.sum(dot_.astype(jnp.float32) * ot.astype(jnp.float32),
                   axis=0, keepdims=True)  # (1, bq) = D
    ds = (pn * (dpt - drow)).astype(k.dtype)  # (dS)^T, scale applied post-matmul
    dk_scr[...] += jax.lax.dot(ds, q, preferred_element_type=jnp.float32) * sm_scale
    # dQ = dS K: contract Lk (sublane axis of both)
    dq = jax.lax.dot_general(ds, k, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * sm_scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(i == nq - 1)
    def _fin():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _smallhead_backward(q, k, v, out, g, *, block_q: int, interpret: bool):
    """Fused dq/dk/dv for small head dims (d <= 32) with K/V VMEM-resident.

    Shapes like the forward; one pallas_call total."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    sm_scale = 1.0 / math.sqrt(d)

    if d % 16 != 0:
        dp_ = ((d + 15) // 16) * 16
        pad4 = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, dp_ - d)))  # noqa: E731
        q, k, v, out, g = pad4(q), pad4(k), pad4(v), pad4(out), pad4(g)
    else:
        dp_ = d
    block_q = max(8, min(block_q, lq))
    q = _pad_axis(q, 2, block_q)
    out = _pad_axis(out, 2, block_q)
    g = _pad_axis(g, 2, block_q)
    k = _pad_axis(k, 2, 16)
    v = _pad_axis(v, 2, 16)
    lqp, lkp = q.shape[2], k.shape[2]
    bh = b * h
    qr, kr, vr = (t.reshape(bh, -1, dp_) for t in (q, k, v))
    # dO / O streamed pre-transposed so D rides the sublane axis in-kernel.
    gt = jnp.swapaxes(g.reshape(bh, lqp, dp_), 1, 2)
    ot = jnp.swapaxes(out.reshape(bh, lqp, dp_), 1, 2)

    nq = lqp // block_q
    dq, dk, dv = pl.pallas_call(
        functools.partial(_smallhead_bwd_kernel, sm_scale=sm_scale, kv_len=lk),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lqp, dp_), q.dtype),
            jax.ShapeDtypeStruct((bh, lkp, dp_), q.dtype),
            jax.ShapeDtypeStruct((bh, lkp, dp_), q.dtype),
        ),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, dp_), lambda bhi, i: (bhi, i, 0)),  # q
            pl.BlockSpec((1, lkp, dp_), lambda bhi, i: (bhi, 0, 0)),      # k
            pl.BlockSpec((1, lkp, dp_), lambda bhi, i: (bhi, 0, 0)),      # v
            pl.BlockSpec((1, dp_, block_q), lambda bhi, i: (bhi, 0, i)),  # dO^T
            pl.BlockSpec((1, dp_, block_q), lambda bhi, i: (bhi, 0, i)),  # O^T
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dp_), lambda bhi, i: (bhi, i, 0)),
            pl.BlockSpec((1, lkp, dp_), lambda bhi, i: (bhi, 0, 0)),
            pl.BlockSpec((1, lkp, dp_), lambda bhi, i: (bhi, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((lkp, dp_), jnp.float32),
            pltpu.VMEM((lkp, dp_), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qr, kr, vr, gt, ot)

    dq = dq.reshape(b, h, lqp, dp_)[:, :, :lq, :d]
    dk = dk.reshape(b, h, lkp, dp_)[:, :, :lk, :d]
    dv = dv.reshape(b, h, lkp, dp_)[:, :, :lk, :d]
    return dq, dk, dv


def _lse_kernel(q_ref, k_ref, lse_ref, m_scr, l_scr, *, sm_scale, kv_len, block_k):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)

    st = jax.lax.dot_general(
        k_ref[0], q_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # (block_k, block_q)
    if kv_len % block_k != 0:
        valid = kv_len - j * block_k
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(row < valid, st, _NEG_INF)
    m_new = jnp.maximum(m_scr[...], jnp.max(st, axis=0, keepdims=True))
    l_scr[...] = l_scr[...] * jnp.exp(m_scr[...] - m_new) + jnp.sum(jnp.exp(st - m_new), axis=0, keepdims=True)
    m_scr[...] = m_new

    @pl.when(j == nk - 1)
    def _fin():
        lse_ref[0] = m_scr[...] + jnp.log(l_scr[...])


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dk_ref, dv_ref,
                    dk_scr, dv_scr, *, sm_scale, kv_len, block_k):
    i = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * sm_scale
    j = pl.program_id(1)
    if kv_len % block_k != 0:
        valid = kv_len - j * block_k
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(row < valid, st, _NEG_INF)
    p = jnp.exp(st - lse_ref[0])  # (block_k, block_q)
    dv_scr[...] += jax.lax.dot(p.astype(do.dtype), do, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - d_ref[0])  # (block_k, block_q)
    dk_scr[...] += jax.lax.dot(ds.astype(q.dtype), q, preferred_element_type=jnp.float32) * sm_scale

    @pl.when(i == nq - 1)
    def _fin():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dq_ref, dq_scr,
                   *, sm_scale, kv_len, block_k):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * sm_scale
    if kv_len % block_k != 0:
        valid = kv_len - j * block_k
        row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(row < valid, st, _NEG_INF)
    p = jnp.exp(st - lse_ref[0])
    dp = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - d_ref[0])  # (block_k, block_q)
    # dq += ds^T K * scale: contract the block_k sublane axis of both
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale

    @pl.when(j == nk - 1)
    def _fin():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_backward_nobias(q, k, v, out, g, *, block_q: int, block_k: int, interpret: bool):
    """Fused dq/dk/dv for bias-free attention. Shapes like the forward."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if d <= 32 and lk <= 4096:
        # Single-pass transposed kernel. block_q stays >= 128 (the lowering
        # requires the trailing block dim divide 128); at Lk=4096 the ~5
        # live (Lk, 128) fp32 score temporaries need ~20 MB of scoped VMEM,
        # above the conservative 16 MB default — raised via compiler params
        # inside _smallhead_backward.
        return _smallhead_backward(
            q, k, v, out, g, block_q=256 if lk <= 2048 else 128, interpret=interpret)
    sm_scale = 1.0 / math.sqrt(d)

    if d % 16 != 0:
        dp_ = ((d + 15) // 16) * 16
        pad4 = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, dp_ - d)))  # noqa: E731
        q, k, v, out, g = pad4(q), pad4(k), pad4(v), pad4(out), pad4(g)
    else:
        dp_ = d
    block_q = max(8, min(block_q, lq))
    block_k = max(8, min(block_k, lk))
    q = _pad_axis(q, 2, block_q)
    out = _pad_axis(out, 2, block_q)
    g = _pad_axis(g, 2, block_q)
    k = _pad_axis(k, 2, block_k)
    v = _pad_axis(v, 2, block_k)
    lqp, lkp = q.shape[2], k.shape[2]
    bh = b * h
    qr, kr, vr = (t.reshape(bh, -1, dp_) for t in (q, k, v))
    outr, gr = (t.reshape(bh, lqp, dp_) for t in (out, g))

    # D = rowsum(dO o O) — cheap elementwise + reduce, jnp is fine.
    # (bh, 1, lqp): the singleton middle axis keeps Mosaic block shapes legal
    # (a (1, block_q) 2D block fails the (8, 128) divisibility rule).
    dvec = jnp.sum(gr.astype(jnp.float32) * outr.astype(jnp.float32), axis=-1)[:, None, :]

    nq, nk = lqp // block_q, lkp // block_k
    lse = pl.pallas_call(
        functools.partial(_lse_kernel, sm_scale=sm_scale, kv_len=lk, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, 1, lqp), jnp.float32),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, dp_), lambda bhi, i, j: (bhi, i, 0)),
            pl.BlockSpec((1, block_k, dp_), lambda bhi, i, j: (bhi, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q), lambda bhi, i, j: (bhi, 0, i)),
        scratch_shapes=[pltpu.VMEM((1, block_q), jnp.float32), pltpu.VMEM((1, block_q), jnp.float32)],
        interpret=interpret,
    )(qr, kr)

    row_specs = [
        pl.BlockSpec((1, block_q, dp_), lambda bhi, j, i: (bhi, i, 0)),  # q
        pl.BlockSpec((1, block_k, dp_), lambda bhi, j, i: (bhi, j, 0)),  # k
        pl.BlockSpec((1, block_k, dp_), lambda bhi, j, i: (bhi, j, 0)),  # v
        pl.BlockSpec((1, block_q, dp_), lambda bhi, j, i: (bhi, i, 0)),  # do
        pl.BlockSpec((1, 1, block_q), lambda bhi, j, i: (bhi, 0, i)),    # lse
        pl.BlockSpec((1, 1, block_q), lambda bhi, j, i: (bhi, 0, i)),    # D
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, kv_len=lk, block_k=block_k),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lkp, dp_), q.dtype),
            jax.ShapeDtypeStruct((bh, lkp, dp_), q.dtype),
        ),
        grid=(bh, nk, nq),
        in_specs=row_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, dp_), lambda bhi, j, i: (bhi, j, 0)),
            pl.BlockSpec((1, block_k, dp_), lambda bhi, j, i: (bhi, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, dp_), jnp.float32),
            pltpu.VMEM((block_k, dp_), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, gr, lse, dvec)

    q_specs = [
        pl.BlockSpec((1, block_q, dp_), lambda bhi, i, j: (bhi, i, 0)),  # q
        pl.BlockSpec((1, block_k, dp_), lambda bhi, i, j: (bhi, j, 0)),  # k
        pl.BlockSpec((1, block_k, dp_), lambda bhi, i, j: (bhi, j, 0)),  # v
        pl.BlockSpec((1, block_q, dp_), lambda bhi, i, j: (bhi, i, 0)),  # do
        pl.BlockSpec((1, 1, block_q), lambda bhi, i, j: (bhi, 0, i)),    # lse
        pl.BlockSpec((1, 1, block_q), lambda bhi, i, j: (bhi, 0, i)),    # D
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, kv_len=lk, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, lqp, dp_), q.dtype),
        grid=(bh, nq, nk),
        in_specs=q_specs,
        out_specs=pl.BlockSpec((1, block_q, dp_), lambda bhi, i, j: (bhi, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, dp_), jnp.float32)],
        interpret=interpret,
    )(qr, kr, vr, gr, lse, dvec)

    dq = dq.reshape(b, h, lqp, dp_)[:, :, :lq, :d]
    dk = dk.reshape(b, h, lkp, dp_)[:, :, :lk, :d]
    dv = dv.reshape(b, h, lkp, dp_)[:, :, :lk, :d]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, bias, block_q, block_k, interpret):
    return _flash_forward(q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret)


def _flash_fwd(q, k, v, bias, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret)
    return out, (q, k, v, bias, out)


def _flash_bwd(block_q, block_k, interpret, residuals, g):
    q, k, v, bias, out = residuals
    if bias is None:
        # Fused Pallas backward: no (Lq, Lk) materialization, lse recomputed.
        dq, dk, dv = _flash_backward_nobias(
            q, k, v, out, g, block_q=block_q, block_k=block_k, interpret=interpret
        )
        return dq, dk, dv, None

    # Biased (TMSA rel-pos) path: XLA recompute — the bias gradient is a
    # dense (H, Lq, Lk) tensor, so a fused kernel saves nothing; TMSA
    # sequences are short ((res/patch)^2).
    def ref(q_, k_, v_, b_):
        return _attention_reference(q_, k_, v_, b_)

    _, vjp = jax.vjp(ref, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """softmax(Q K^T / sqrt(d) + bias) V with online softmax on TPU.

    q: (B, H, Lq, D); k/v: (B, H, Lk, D); bias: (H, Lq, Lk) or None.
    ``interpret=None`` auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash(q, k, v, bias, block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# Transposed-layout entry: (B, H, D, L) in and out.
#
# The b512 sampler profile (artifacts/profile_r3_b512) showed ~12% of device
# time in XLA layout copies bracketing the flash kernel: the q/k/v projection
# matmuls naturally emit an L-minor layout, the (B, H, L, d)-taking kernel
# demands d-minor, and the resulting {2,1,3,0}->{3,2,1,0} copies move 32 MB
# in 8-byte runs (~40 GB/s). This entry consumes the projections' natural
# orientation directly: q/k/v arrive (B, H, D, L) — a free bitcast of the
# transposed projection output (ops/mp.py:mp_linear_apply_t) — and the
# output leaves (B, H, D, L), which the out-projection contracts without a
# copy (mp.py:mp_linear_consume_t). The kernel math is the small-head
# kernel's, one index shuffle earlier: st = kT^T qT is ALREADY the
# transposed score layout the sublane softmax wants, and ot = vT p is a
# plain matmul.
# ---------------------------------------------------------------------------


def _smallhead_kernel_t(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    q = q_ref[0]  # (dp, block_q)
    k = k_ref[0]  # (dp, Lk)
    v = v_ref[0]  # (dp, Lk)
    # s^T: (Lk, block_q) — contract d (dim 0 of both operands)
    st = jax.lax.dot_general(k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    st = st * sm_scale
    m = jnp.max(st, axis=0, keepdims=True)  # sublane reduction
    p = jnp.exp(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    # out^T = V^T P : (dp, Lk) @ (Lk, block_q) -> (dp, block_q)
    ot = jax.lax.dot_general(v, p.astype(v.dtype), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (ot / l).astype(o_ref.dtype)


def _smallhead_bias_kernel_t(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    st = jax.lax.dot_general(k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    st = st * sm_scale + bias_ref[0].astype(jnp.float32)  # bias pre-transposed (Lk, Lq)
    m = jnp.max(st, axis=0, keepdims=True)
    p = jnp.exp(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    ot = jax.lax.dot_general(v, p.astype(v.dtype), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (ot / l).astype(o_ref.dtype)


def _smallhead_forward_t(qT, kT, vT, bias, *, block_q: int, interpret: bool):
    b, h, d, lq = qT.shape
    lk = kT.shape[3]
    sm_scale = 1.0 / math.sqrt(d)

    block_q = max(8, min(block_q, lq))
    qT = _pad_axis(qT, 3, block_q)
    lqp = qT.shape[3]
    bh = b * h
    qr = qT.reshape(bh, d, lqp)
    kr = kT.reshape(bh, d, lk)
    vr = vT.reshape(bh, d, lk)

    grid = (bh, lqp // block_q)
    in_specs = [
        pl.BlockSpec((1, d, block_q), lambda bhi, i: (bhi, 0, i)),
        pl.BlockSpec((1, d, lk), lambda bhi, i: (bhi, 0, 0)),
        pl.BlockSpec((1, d, lk), lambda bhi, i: (bhi, 0, 0)),
    ]
    operands = [qr, kr, vr]
    if bias is not None:
        bias_h = bias.shape[0]
        # scores live transposed: bias (H, Lq, Lk) -> (H, Lk, Lq)
        bias_t = _pad_axis(_pad_axis(jnp.swapaxes(bias, 1, 2).astype(jnp.float32), 1, 16), 2, block_q)
        lkp_b = bias_t.shape[1]
        in_specs.append(
            pl.BlockSpec(
                (1, lkp_b, block_q),
                (lambda bhi, i: (bhi % bias_h, 0, i)) if bias_h > 1 else (lambda bhi, i: (0, 0, i)),
            )
        )
        operands.append(bias_t)
        # the padded bias rows (lk..lkp_b) would add exp(0) mass: the biased
        # kernel must mask them — only reachable when lk % 16 != 0, and the
        # bias rows are zero there, so mask via the score instead.
        if lkp_b != lk:
            raise NotImplementedError(
                "flash_attention_t biased path needs Lk % 16 == 0 "
                f"(got Lk={lk}); use flash_attention for ragged kv lengths"
            )
        kernel = functools.partial(_smallhead_bias_kernel_t, sm_scale=sm_scale)
    else:
        kernel = functools.partial(_smallhead_kernel_t, sm_scale=sm_scale)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, d, lqp), qT.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, d, block_q), lambda bhi, i: (bhi, 0, i)),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, d, lqp)[:, :, :, :lq]


def _smallhead_bwd_kernel_t(q_ref, k_ref, v_ref, dot_ref, ot_ref,
                            dq_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                            *, sm_scale):
    """Single-pass backward on (d, L) operands — no layout change anywhere.

    The standard small-head backward (``_smallhead_bwd_kernel``) already
    wants dO/O PRE-TRANSPOSED to (d, block_q) so D rides the sublane axis;
    in the transposed pipeline every operand ARRIVES that way, so this
    kernel is the same math with the residual transposes deleted:
    ``st = kTᵀ qT`` is directly the (Lk, bq) score layout, and the three
    gradient contractions each have a d-minor-in/d-minor-out form
    (dVᵀ = dOᵀ P, dKᵀ = Qᵀ dSᵀ·scale, dQᵀ = Kᵀ dS·scale). K/V and the
    fp32 dk/dv accumulators stay VMEM-resident across the q sweep of one
    (b, h), lse re-derived in-kernel — one pallas_call total, like the
    standard single-pass kernel (round-4 VERDICT item 5)."""
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]       # (dp, block_q)
    k = k_ref[0]       # (dp, Lk)
    v = v_ref[0]       # (dp, Lk)
    dot_ = dot_ref[0]  # (dp, block_q) = dO^T (natural layout here)
    ot = ot_ref[0]     # (dp, block_q) = O^T
    # s^T: contract d (sublane axis of both) -> (Lk, bq)
    st = jax.lax.dot_general(k, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * sm_scale
    m = jnp.max(st, axis=0, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(st - m), axis=0, keepdims=True))
    pn = jnp.exp(st - lse)  # P^T, normalized (Lk, bq)
    pnl = pn.astype(v.dtype)
    # dV^T = dO^T P: contract block_q (lanes of both) -> (dp, Lk)
    dv_scr[...] += jax.lax.dot_general(dot_, pnl, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    # (dP)^T = V^T dO contracted over d -> (Lk, bq)
    dpt = jax.lax.dot_general(v, dot_, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    drow = jnp.sum(dot_.astype(jnp.float32) * ot.astype(jnp.float32),
                   axis=0, keepdims=True)  # (1, bq) = D, sublane reduction
    ds = (pn * (dpt - drow)).astype(k.dtype)  # (dS)^T (Lk, bq)
    # dK^T = Q^T dS^T: contract block_q -> (dp, Lk)
    dk_scr[...] += jax.lax.dot_general(q, ds, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32) * sm_scale
    # dQ^T = K^T dS: contract Lk -> (dp, bq)
    dq = jax.lax.dot_general(k, ds, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * sm_scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(i == nq - 1)
    def _fin():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _smallhead_backward_t(qT, kT, vT, outT, gT, *, block_q: int, interpret: bool):
    """Fused dqT/dkT/dvT for the transposed small-head regime: one
    pallas_call, zero layout copies in or out.

    Padded q columns are zero in q AND in dO, so their score columns
    contribute exactly-zero to every gradient (ds column = pn * 0) — no
    masking needed; Lk is taken whole per block like the transposed
    forward."""
    b, h, d, lq = qT.shape
    lk = kT.shape[3]
    sm_scale = 1.0 / math.sqrt(d)

    block_q = max(8, min(block_q, lq))
    qT = _pad_axis(qT, 3, block_q)
    gT = _pad_axis(gT, 3, block_q)
    outT = _pad_axis(outT, 3, block_q)
    lqp = qT.shape[3]
    bh = b * h
    qr = qT.reshape(bh, d, lqp)
    kr = kT.reshape(bh, d, lk)
    vr = vT.reshape(bh, d, lk)
    gr = gT.reshape(bh, d, lqp)
    orr = outT.reshape(bh, d, lqp)

    nq = lqp // block_q
    dq, dk, dv = pl.pallas_call(
        functools.partial(_smallhead_bwd_kernel_t, sm_scale=sm_scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, d, lqp), qT.dtype),
            jax.ShapeDtypeStruct((bh, d, lk), qT.dtype),
            jax.ShapeDtypeStruct((bh, d, lk), qT.dtype),
        ),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda bhi, i: (bhi, 0, i)),  # qT
            pl.BlockSpec((1, d, lk), lambda bhi, i: (bhi, 0, 0)),       # kT
            pl.BlockSpec((1, d, lk), lambda bhi, i: (bhi, 0, 0)),       # vT
            pl.BlockSpec((1, d, block_q), lambda bhi, i: (bhi, 0, i)),  # dO^T
            pl.BlockSpec((1, d, block_q), lambda bhi, i: (bhi, 0, i)),  # O^T
        ],
        out_specs=(
            pl.BlockSpec((1, d, block_q), lambda bhi, i: (bhi, 0, i)),
            pl.BlockSpec((1, d, lk), lambda bhi, i: (bhi, 0, 0)),
            pl.BlockSpec((1, d, lk), lambda bhi, i: (bhi, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, lk), jnp.float32),
            pltpu.VMEM((d, lk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qr, kr, vr, gr, orr)

    dq = dq.reshape(b, h, d, lqp)[:, :, :, :lq]
    dk = dk.reshape(b, h, d, lk)
    dv = dv.reshape(b, h, d, lk)
    return dq, dk, dv


def _transposed_eligible(d: int, lk: int) -> bool:
    """The small-head single-pass regime, i.e. where the transposed layout
    has a kernel. Mirrors _flash_forward's specialization condition."""
    return d <= 32 and lk <= 4096


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_t(qT, kT, vT, bias, block_q, interpret):
    b, h, d, lq = qT.shape
    lk = kT.shape[3]
    if _transposed_eligible(d, lk):
        bq = min(block_q, 256 if lk <= 2048 else 128)
        return _smallhead_forward_t(qT, kT, vT, bias, block_q=bq, interpret=interpret)
    # outside the small-head regime: pay the transposes, reuse the blocked kernel
    tr = lambda t: jnp.swapaxes(t, 2, 3)  # noqa: E731
    return tr(_flash_forward(tr(qT), tr(kT), tr(vT), bias,
                             block_q=block_q, block_k=512, interpret=interpret))


def _flash_t_fwd(qT, kT, vT, bias, block_q, interpret):
    out = _flash_t(qT, kT, vT, bias, block_q, interpret)
    return out, (qT, kT, vT, bias, out)


def _flash_t_bwd(block_q, interpret, residuals, gT):
    qT, kT, vT, bias, outT = residuals
    tr = lambda t: jnp.swapaxes(t, 2, 3)  # noqa: E731
    d, lk = qT.shape[2], kT.shape[3]
    if bias is None and _transposed_eligible(d, lk):
        # Native transposed single-pass backward: no layout copies (this was
        # the 2x tg64 b4 backward regression that pinned TrainConfig to
        # attn_layout="std", artifacts/tg64_bwd_recheck_r4.json).
        bq = min(block_q, 256 if lk <= 2048 else 128)
        dq, dk, dv = _smallhead_backward_t(
            qT, kT, vT, outT, gT, block_q=bq, interpret=interpret)
        return dq, dk, dv, None
    if bias is None:
        dq, dk, dv = _flash_backward_nobias(
            tr(qT), tr(kT), tr(vT), tr(outT), tr(gT),
            block_q=block_q, block_k=512, interpret=interpret,
        )
        return tr(dq), tr(dk), tr(dv), None

    # biased path: XLA recompute on the transposed layout directly
    def ref_t(q_, k_, v_, b_):
        return tr(_attention_reference(tr(q_), tr(k_), tr(v_), b_))

    _, vjp = jax.vjp(ref_t, qT, kT, vT, bias)
    dq, dk, dv, dbias = vjp(gT)
    return dq, dk, dv, dbias


_flash_t.defvjp(_flash_t_fwd, _flash_t_bwd)


def flash_attention_t(
    qT: jnp.ndarray,
    kT: jnp.ndarray,
    vT: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention on transposed (B, H, D, L) operands; output (B, H, D, Lq).

    Same math as :func:`flash_attention` (bias is still (H, Lq, Lk)); the
    layout lets small-head callers feed the projections' natural matmul
    output without XLA layout copies. Backward reuses the standard kernels
    via explicit transposes (the training path keeps its measured numbers;
    the copy elimination targets the sampler's forward).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_t(qT, kT, vT, bias, block_q, interpret)
