"""Flash-attention kernel tests (interpret mode on CPU) against the XLA
reference, including bias, padding, and gradient paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.ops.pallas.flash_attention import _attention_reference, flash_attention

KEY = jax.random.PRNGKey(0)


def _qkv(b=2, h=2, lq=64, lk=64, d=8):
    ks = jax.random.split(KEY, 3)
    q = jax.random.normal(ks[0], (b, h, lq, d))
    k = jax.random.normal(ks[1], (b, h, lk, d))
    v = jax.random.normal(ks[2], (b, h, lk, d))
    return q, k, v


def test_matches_reference_no_bias():
    q, k, v = _qkv()
    out = flash_attention(q, k, v, interpret=True)
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_matches_reference_with_bias():
    q, k, v = _qkv(lq=32, lk=32)
    bias = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32))
    out = flash_attention(q, k, v, bias, interpret=True)
    ref = _attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_unaligned_seq_and_cross_shape():
    # 77-token kv (CLIP text) against 100-token queries: exercises seq padding.
    q, k, v = _qkv(lq=100, lk=77, d=4)
    out = flash_attention(q, k, v, interpret=True, block_q=32, block_k=32)
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_multiple_kv_blocks_online_softmax():
    q, k, v = _qkv(lq=32, lk=256, d=8)
    out = flash_attention(q, k, v, interpret=True, block_q=32, block_k=64)
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_extreme_logits_stable():
    q, k, v = _qkv(lq=16, lk=64, d=8)
    q = q * 30.0  # large logits stress the online softmax
    out = flash_attention(q, k, v, interpret=True, block_q=16, block_k=16)
    ref = _attention_reference(q, k, v, None)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_fused_backward_nobias_grads_match_reference():
    """The fused Pallas backward (dq/dk/dv kernels + lse recompute) must
    match XLA autodiff grads — incl. multi-block, unaligned kv, and small
    head dims."""
    for lq, lk, d, bq, bk in ((64, 64, 8, 32, 32), (100, 77, 4, 32, 32), (32, 256, 48, 32, 64)):
        q, k, v = _qkv(lq=lq, lk=lk, d=d)

        def f_flash(q_, k_, v_):
            return jnp.sum(flash_attention(q_, k_, v_, interpret=True, block_q=bq, block_k=bk) ** 2)

        def f_ref(q_, k_, v_):
            return jnp.sum(_attention_reference(q_, k_, v_, None) ** 2)

        gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-3,
                err_msg=f"shape lq={lq} lk={lk} d={d}",
            )


def test_fused_backward_bf16_finite_and_close():
    q, k, v = _qkv(lq=64, lk=64, d=4)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))

    g_flash = jax.grad(lambda q_: jnp.sum(flash_attention(q_, kb, vb, interpret=True).astype(jnp.float32) ** 2))(qb)
    g_ref = jax.grad(lambda q_: jnp.sum(_attention_reference(q_, kb, vb, None).astype(jnp.float32) ** 2))(qb)
    a = np.asarray(g_flash, dtype=np.float32)
    b = np.asarray(g_ref, dtype=np.float32)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=5e-2, rtol=5e-2)


def test_blocked_kernel_large_head_matches_reference():
    """d > 32 bypasses the small-head specialization: the blocked
    online-softmax kernel handles it (multi-kv-block path)."""
    q, k, v = _qkv(lq=64, lk=128, d=48)
    out = flash_attention(q, k, v, interpret=True, block_q=32, block_k=32)
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    bias = jax.random.normal(jax.random.PRNGKey(8), (2, 64, 128))
    out_b = flash_attention(q, k, v, bias, interpret=True, block_q=32, block_k=32)
    ref_b = _attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b), atol=2e-5, rtol=2e-5)


def test_smallhead_flagship_shape_bf16():
    """The flagship fusion-attention regime: d=4, 8 heads, bf16. The
    transposed small-head kernel must match the reference at bf16 tolerance
    and stay finite under large logits."""
    q, k, v = _qkv(b=2, h=8, lq=128, lk=128, d=4)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(q, k, v, interpret=True)
    ref = _attention_reference(q, k, v, None)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=2e-2, rtol=2e-2
    )
    out_x = flash_attention(q * 30.0, k, v, interpret=True)
    assert np.isfinite(np.asarray(out_x, dtype=np.float32)).all()


def test_moe_kernels_bf16_roundtrip():
    """bf16 dispatch/combine (sublane-2 packing): the near-singleton axis is
    padded to the packing granule; values match the jnp path exactly."""
    from hdmoe_tpu.ops.pallas.moe_kernels import combine_rows, combine_tables, dispatch_rows
    from hdmoe_tpu.models.moe_stacked import expert_assignment

    b, e = 8, 4
    x = jax.random.normal(KEY, (b, 6, 6, 3)).astype(jnp.bfloat16)
    gate = jax.nn.one_hot(jnp.arange(b) % e, e)
    idx, w = expert_assignment(gate.astype(jnp.float32), b)
    xg = dispatch_rows(x, idx)
    np.testing.assert_array_equal(np.asarray(xg, dtype=np.float32), np.asarray(x[idx], dtype=np.float32))
    slots, wt = combine_tables(idx, w, b, 1)
    out = combine_rows(xg * 2.0, slots, wt)
    ref = jnp.zeros_like(x).at[idx.reshape(-1)].add(
        ((xg * 2.0) * w[..., None, None, None].astype(jnp.bfloat16)).reshape(e * b, 6, 6, 3)
    )
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=1e-2, rtol=1e-2
    )


def test_gradients_match_reference():
    q, k, v = _qkv(lq=32, lk=32, d=8)
    bias = jax.random.normal(jax.random.PRNGKey(8), (2, 32, 32))

    def f_flash(q, k, v, b):
        return jnp.sum(flash_attention(q, k, v, b, interpret=True) ** 2)

    def f_ref(q, k, v, b):
        return jnp.sum(_attention_reference(q, k, v, b) ** 2)

    gf = jax.grad(f_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3)


def test_mp_attention_use_flash_parity():
    """mp_attention_apply(use_flash=True) must match the pure-XLA path."""
    from hdmoe_tpu.ops.attention import mp_attention_apply, mp_attention_init

    params = mp_attention_init(KEY, num_heads=4, emb_dim=32, seq_ln=64, time_dim=16)
    seq = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
    t = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    ref = mp_attention_apply(params, seq, time_embedding=t, num_heads=4, use_flash=False)
    out = mp_attention_apply(params, seq, time_embedding=t, num_heads=4, use_flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_smallhead_single_pass_backward_multiblock():
    """The single-pass small-head backward (d <= 32): dk/dv accumulate in
    VMEM across q blocks and write once; covers multi-q-block, unaligned lq,
    and the lk > 2048 block_q=128 regime gate."""
    for lq, lk, d in ((300, 128, 4), (64, 2100, 8)):
        q, k, v = _qkv(lq=lq, lk=lk, d=d)

        def f_flash(q_, k_, v_):
            return jnp.sum(flash_attention(q_, k_, v_, interpret=True) ** 2)

        def f_ref(q_, k_, v_):
            return jnp.sum(_attention_reference(q_, k_, v_, None) ** 2)

        gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-3,
                err_msg=f"lq={lq} lk={lk} d={d}",
            )


# ---------------------------------------------------------------------------
# Transposed-layout entry (flash_attention_t): the copy-elimination path for
# small heads (profile_r3_b512 found ~12% of sampler device time in XLA
# layout copies bracketing the standard-layout kernel).
# ---------------------------------------------------------------------------


def _tr(t):
    return jnp.swapaxes(t, 2, 3)


def test_flash_attention_t_matches_reference():
    from hdmoe_tpu.ops.pallas.flash_attention import flash_attention_t

    for lq, lk, d in ((64, 64, 8), (300, 128, 4), (64, 2100, 8)):
        q, k, v = _qkv(lq=lq, lk=lk, d=d)
        out_t = flash_attention_t(_tr(q), _tr(k), _tr(v), interpret=True)
        ref = _attention_reference(q, k, v, None)
        np.testing.assert_allclose(
            np.asarray(_tr(out_t)), np.asarray(ref), atol=2e-5, rtol=2e-5,
            err_msg=f"lq={lq} lk={lk} d={d}")


def test_flash_attention_t_with_bias():
    from hdmoe_tpu.ops.pallas.flash_attention import flash_attention_t

    q, k, v = _qkv(lq=64, lk=64, d=8)
    bias = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64))
    out_t = flash_attention_t(_tr(q), _tr(k), _tr(v), bias, interpret=True)
    ref = _attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(_tr(out_t)), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_attention_t_large_head_fallback():
    """d > 32 exits the small-head regime: the transposed entry must fall
    back to the blocked kernel via explicit transposes, exactly."""
    from hdmoe_tpu.ops.pallas.flash_attention import flash_attention_t

    q, k, v = _qkv(lq=64, lk=64, d=64)
    out_t = flash_attention_t(_tr(q), _tr(k), _tr(v), interpret=True)
    ref = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(_tr(out_t)), np.asarray(ref), atol=2e-6, rtol=2e-6)


def test_flash_attention_t_grads_match_reference():
    from hdmoe_tpu.ops.pallas.flash_attention import flash_attention_t

    q, k, v = _qkv(lq=96, lk=64, d=4)
    bias = jax.random.normal(jax.random.PRNGKey(9), (2, 96, 64))

    for b_ in (None, bias):
        def f_t(q_, k_, v_):
            return jnp.sum(flash_attention_t(_tr(q_), _tr(k_), _tr(v_), b_, interpret=True) ** 2)

        def f_ref(q_, k_, v_):
            return jnp.sum(_attention_reference(q_, k_, v_, b_) ** 2)

        gt = jax.grad(f_t, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, e in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=2e-4, rtol=2e-3,
                                       err_msg=f"bias={b_ is not None}")


def test_flash_attention_t_fused_bwd_odd_shapes():
    """The round-5 native transposed backward (_smallhead_backward_t) at
    ragged lq (block padding) and long lk, fp32 and bf16 — grads must match
    the reference attention's."""
    from hdmoe_tpu.ops.pallas.flash_attention import flash_attention_t

    for lq, lk, d, dtype, tol in (
        (300, 128, 4, jnp.float32, 2e-4),
        (64, 2100, 8, jnp.float32, 2e-4),
        (96, 64, 4, jnp.bfloat16, 3e-2),
    ):
        q, k, v = _qkv(lq=lq, lk=lk, d=d)
        q, k, v = (t.astype(dtype) for t in (q, k, v))

        def f_t(q_, k_, v_):
            return jnp.sum(flash_attention_t(_tr(q_), _tr(k_), _tr(v_),
                                             interpret=True).astype(jnp.float32) ** 2)

        def f_ref(q_, k_, v_):
            return jnp.sum(_attention_reference(
                q_.astype(jnp.float32), k_.astype(jnp.float32),
                v_.astype(jnp.float32), None) ** 2)

        gt = jax.grad(f_t, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
        for a, e in zip(gt, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(e), atol=tol, rtol=tol,
                err_msg=f"lq={lq} lk={lk} d={d} {dtype}")


def test_attn_layout_t_matches_std_pipeline():
    """The full mp_attention transposed pipeline (transposed projections +
    flash_attention_t + transposed out-projection) must match the standard
    flash path — self-attn (biased, with time) and cross-attn."""
    from hdmoe_tpu.ops.attention import attn_layout, mp_attention_apply, mp_attention_init

    params = mp_attention_init(KEY, num_heads=4, emb_dim=32, seq_ln=64, time_dim=16)
    seq = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
    t = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    with attn_layout("std"):
        ref = mp_attention_apply(params, seq, time_embedding=t, num_heads=4, use_flash=True)
    with attn_layout("t"):
        out = mp_attention_apply(params, seq, time_embedding=t, num_heads=4, use_flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)

    cparams = mp_attention_init(KEY, num_heads=4, emb_dim=32, seq_ln=64,
                                context_dim=24, is_cross_attn=True)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 48, 24))
    with attn_layout("std"):
        cref = mp_attention_apply(cparams, seq, context=ctx, num_heads=4,
                                  is_cross_attn=True, use_flash=True)
    with attn_layout("t"):
        cout = mp_attention_apply(cparams, seq, context=ctx, num_heads=4,
                                  is_cross_attn=True, use_flash=True)
    np.testing.assert_allclose(np.asarray(cout), np.asarray(cref), atol=3e-5, rtol=3e-5)
