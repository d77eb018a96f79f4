"""Magnitude-preserving multi-head attention, TPU-native.

Re-design of the reference ``MP_Attention`` (model_internals.py:279-409).
The reference routes (B, L, C) sequences through 1x1 MP convolutions on a
permuted (B, C, L, 1) layout; a 1x1 conv is exactly a per-position linear map,
so here projections are plain MP linears on (B, L, C) — identical math, no
layout churn, and the Q@K^T / @V contractions map straight onto the MXU.

Features preserved from the reference:
- optional additive time projections (q always; k/v only for self-attention,
  model_internals.py:329-331, 368-372)
- learnable dense relative-position bias (heads, S, S) for self-attention,
  sliced for shorter sequences / bicubically resized for longer ones
  (model_internals.py:383-399)
- residual mix via ``mp_sum(residual, out, attn_balance)``
  (model_internals.py:409)

The softmax(QK^T+bias)V core has three implementations, selected by ``impl``
(or the legacy ``use_flash`` flag):

- ``"dense"``: plain XLA einsum/softmax (the parity path);
- ``"flash"``: Pallas blocked online-softmax kernel
  (ops/pallas/flash_attention.py) — the single-chip memory-traffic fix;
- ``"ring"``: sequence-parallel ring attention over a mesh axis
  (ops/ring_attention.py) for the 256x256+ stretch configs. Requires an
  active :func:`ring_attention_context`; sequences that do not divide the
  mesh axis fall back to dense. Not usable inside vmapped expert banks
  (shard_map cannot nest under vmap) — use dispatch "dense"/"capacity".
"""

from __future__ import annotations

import contextvars
import math
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp

from hdmoe_tpu.ops import mp

_RING_CTX: list = []  # trace-time stack of (mesh, axis)

# Trace-time switch for the flash input layout. "t" (default) routes
# small-head flash attention through the transposed pipeline: projections
# emit (B, C, L) (their natural MXU output orientation), the kernel consumes
# (B, H, d, L) as a free bitcast, and the out-projection contracts the
# transposed result directly — eliminating the {2,1,3,0}->{3,2,1,0} layout
# copies that cost ~12% of sampler device time at batch 512
# (artifacts/profile_r3_b512). "std" forces the original (B, H, L, d) path
# (the A/B control; also what dense/ring always use).
_ATTN_LAYOUT = contextvars.ContextVar("mp_attn_layout", default="t")


@contextmanager
def attn_layout(layout: str):
    assert layout in ("t", "std"), layout
    tok = _ATTN_LAYOUT.set(layout)
    try:
        yield
    finally:
        _ATTN_LAYOUT.reset(tok)


@contextmanager
def ring_attention_context(mesh, axis: str = "data"):
    """Declare the mesh axis that ``impl="ring"`` attention shards over.

    Trace-time state (the model apply signature stays mesh-free); set it
    around the jit/pjit trace of a forward that uses ring attention."""
    _RING_CTX.append((mesh, axis))
    try:
        yield
    finally:
        _RING_CTX.pop()


def _ring_ctx():
    return _RING_CTX[-1] if _RING_CTX else None


def mp_attention_init(
    key: jax.Array,
    num_heads: int,
    emb_dim: int,
    seq_ln: int,
    time_dim: int = 0,
    context_dim: Optional[int] = None,
    is_cross_attn: bool = False,
) -> dict:
    assert emb_dim % num_heads == 0
    if context_dim is None:
        context_dim = emb_dim
    keys = jax.random.split(key, 7)
    params = {
        "q_proj": mp.mp_conv_init(keys[0], emb_dim, emb_dim),
        "k_proj": mp.mp_conv_init(keys[1], context_dim, emb_dim),
        "v_proj": mp.mp_conv_init(keys[2], context_dim, emb_dim),
        "out_proj": mp.mp_conv_init(keys[3], emb_dim, emb_dim),
    }
    if not is_cross_attn:
        params["rel_pos_bias"] = jnp.zeros((num_heads, seq_ln, seq_ln), dtype=jnp.float32)
    if time_dim > 0:
        params["q_time"] = mp.mp_conv_init(keys[4], time_dim, emb_dim)
        if not is_cross_attn:
            params["k_time"] = mp.mp_conv_init(keys[5], time_dim, emb_dim)
            params["v_time"] = mp.mp_conv_init(keys[6], time_dim, emb_dim)
    return params


def _resolve_bias(bias: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Slice (short sequences) or bicubically resize (long) the rel-pos bias."""
    trained = bias.shape[1]
    if seq_len <= trained:
        return bias[:, :seq_len, :seq_len]
    return jax.image.resize(bias, (bias.shape[0], seq_len, seq_len), method="cubic")


def mp_attention_apply(
    params: dict,
    query: jnp.ndarray,
    gain_s=1.0,
    gain_t=1.0,
    context: Optional[jnp.ndarray] = None,
    time_embedding: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    attn_balance: float = 0.5,
    is_cross_attn: bool = False,
    use_flash: bool = False,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Attention forward on (B, L, C) sequences.

    ``time_embedding`` is (B, time_dim) or (B, 1, time_dim); its projection is
    broadcast-added over the sequence axis, matching the reference's
    (B, C, 1, 1) conv output broadcast.
    """
    res = query
    b, seq_len, emb_dim = query.shape
    head_dim = emb_dim // num_heads
    ctx = query if context is None else context

    # Transposed fast path: small-head flash consumes the projections'
    # natural L-minor matmul output as (B, H, d, L) bitcasts — no XLA layout
    # copies in or out (see attn_layout above). Biased (self-attn) calls
    # need Lk % 16 == 0 for the pre-transposed bias tile; every TMSA
    # sequence ((res/patch)^2) satisfies it.
    impl_resolved = impl or ("flash" if use_flash else "dense")
    if (
        impl_resolved == "flash"
        and _ATTN_LAYOUT.get() == "t"
        and head_dim <= 32
        and ctx.shape[1] <= 4096
        and (is_cross_attn or ctx.shape[1] % 16 == 0)
    ):
        from hdmoe_tpu.ops.pallas.flash_attention import flash_attention_t

        lk = ctx.shape[1]
        q_t = mp.mp_linear_apply_t(params["q_proj"], query, gain=gain_s)  # (B, C, Lq)
        k_t = mp.mp_linear_apply_t(params["k_proj"], ctx, gain=gain_s)
        v_t = mp.mp_linear_apply_t(params["v_proj"], ctx, gain=gain_s)
        if "q_time" in params and time_embedding is not None:
            t = time_embedding.reshape(b, -1)
            q_t = q_t + mp.mp_conv_apply(params["q_time"], t, gain=gain_t)[:, :, None]
            if not is_cross_attn:
                k_t = k_t + mp.mp_conv_apply(params["k_time"], t, gain=gain_t)[:, :, None]
                v_t = v_t + mp.mp_conv_apply(params["v_time"], t, gain=gain_t)[:, :, None]
        bias = None if is_cross_attn else _resolve_bias(params["rel_pos_bias"], seq_len)
        out_t = flash_attention_t(
            q_t.reshape(b, num_heads, head_dim, seq_len),
            k_t.reshape(b, num_heads, head_dim, lk),
            v_t.reshape(b, num_heads, head_dim, lk),
            bias=bias,
        )
        out = mp.mp_linear_consume_t(
            params["out_proj"], out_t.reshape(b, emb_dim, seq_len), gain=gain_s
        )
        return mp.mp_sum(res, out, attn_balance)

    q = mp.mp_conv_apply(params["q_proj"], query.reshape(-1, emb_dim), gain=gain_s).reshape(b, seq_len, emb_dim)
    k = mp.mp_conv_apply(params["k_proj"], ctx.reshape(-1, ctx.shape[-1]), gain=gain_s).reshape(b, ctx.shape[1], emb_dim)
    v = mp.mp_conv_apply(params["v_proj"], ctx.reshape(-1, ctx.shape[-1]), gain=gain_s).reshape(b, ctx.shape[1], emb_dim)

    if "q_time" in params and time_embedding is not None:
        t = time_embedding.reshape(b, -1)
        q = q + mp.mp_conv_apply(params["q_time"], t, gain=gain_t)[:, None, :]
        if not is_cross_attn:
            k = k + mp.mp_conv_apply(params["k_time"], t, gain=gain_t)[:, None, :]
            v = v + mp.mp_conv_apply(params["v_time"], t, gain=gain_t)[:, None, :]

    # (B, L, H, D) -> (B, H, L, D); channel index = h*head_dim + d, matching the
    # reference's view(B, H, D, L) split of the conv channel axis.
    q = q.reshape(b, seq_len, num_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, k.shape[1], num_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, v.shape[1], num_heads, head_dim).transpose(0, 2, 1, 3)

    bias = None
    if not is_cross_attn:
        bias = _resolve_bias(params["rel_pos_bias"], seq_len)

    impl = impl or ("flash" if use_flash else "dense")
    if impl == "ring":
        ctx_ring = _ring_ctx()
        n = ctx_ring[0].shape[ctx_ring[1]] if ctx_ring else 0
        if ctx_ring is not None and seq_len % n == 0 and k.shape[2] % n == 0:
            from hdmoe_tpu.ops.ring_attention import sequence_parallel_attention

            out = sequence_parallel_attention(q, k, v, ctx_ring[0], ctx_ring[1], bias=bias)
        else:  # no mesh context / indivisible sequence: exact dense fallback
            impl = "dense"
    if impl == "flash":
        from hdmoe_tpu.ops.pallas.flash_attention import flash_attention

        out = flash_attention(q, k, v, bias=bias)
    elif impl == "dense":
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(head_dim)
        if bias is not None:
            scores = scores + bias[None]
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    out = out.transpose(0, 2, 1, 3).reshape(b, seq_len, emb_dim)
    out = mp.mp_conv_apply(params["out_proj"], out.reshape(-1, emb_dim), gain=gain_s).reshape(b, seq_len, emb_dim)
    return mp.mp_sum(res, out, attn_balance)
