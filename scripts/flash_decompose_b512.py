"""Decompose the small-head flash kernel's 19.4 ms/call at the b512 grid.

profile_r3_b512 puts this kernel at ~54% of device self-time and
flash_blockq_b512.json shows the block ladder is already optimal, so the
remaining question is WHERE inside the kernel the time goes: the depth-4
score matmul (K q^T, 3% MXU contraction depth), the sublane softmax
(max/exp/sum), or the AV matmul (V^T P, 4-of-128 output sublanes).

Method: ablated kernel variants on the dominant shape (512, 8, 1024, 4)
with identical BlockSpecs/grid, each timed as a >=1000-iteration chained
lax.scan minus an empty-scan baseline (CLAUDE.md micro-benchmark rule;
feedback clipped to keep bf16 finite). Differences between variants
isolate each stage:

  full      = DMA/overhead + st + softmax + AV     (the real kernel)
  no_exp    = full minus the exp                    (exp cost)
  no_softmax= full minus max/exp/sum                (whole softmax cost)
  no_av     = full minus the AV matmul              (AV cost)
  st_only   = st matmul + slice write               (st + floor)

Writes artifacts/flash_decompose_b512.json.
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/flash_decompose_b512.json"
B, H, L, D = 512, 8, 1024, 4
BLOCK_Q = 256
ITERS = 1000


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from hdmoe_tpu.ops.pallas.flash_attention import flash_attention

    sm_scale = 1.0 / math.sqrt(D)

    # Variant kernels: same memory traffic and grid as _smallhead_kernel
    # (flash_attention.py:204), stages ablated one at a time. Shapes here
    # need no padding (1024 % 256 == 0, 1024 % 16 == 0) so the kv-mask
    # branch is dead in the real kernel too.
    def k_full(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(st, axis=0, keepdims=True)
        p = jnp.exp(st - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        ot = jax.lax.dot_general(v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0] = (ot / l).astype(o_ref.dtype)

    def k_no_exp(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(st, axis=0, keepdims=True)
        p = st - m  # exp ablated
        l = jnp.sum(p, axis=0, keepdims=True)
        ot = jax.lax.dot_general(v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0] = (ot / (l + 1.0)).astype(o_ref.dtype)

    def k_no_softmax(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * sm_scale
        ot = jax.lax.dot_general(v, st.astype(v.dtype), (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0] = ot.astype(o_ref.dtype)

    def k_no_av(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]  # still loaded: keep DMA traffic identical
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(st, axis=0, keepdims=True)
        p = jnp.exp(st - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        o_ref[0] = ((p[:D] / l) + jnp.sum(v[:1]) * 0.0).astype(o_ref.dtype)

    def k_st_only(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * sm_scale
        o_ref[0] = (st[:D] + jnp.sum(v[:1]) * 0.0).astype(o_ref.dtype)

    bh = B * H

    def wrap(kernel):
        def fwd(q, k, v):
            qr = q.reshape(bh, L, D)
            kr = k.reshape(bh, L, D)
            vr = v.reshape(bh, L, D)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((bh, D, L), q.dtype),
                grid=(bh, L // BLOCK_Q),
                in_specs=[
                    pl.BlockSpec((1, BLOCK_Q, D), lambda bhi, i: (bhi, i, 0)),
                    pl.BlockSpec((1, L, D), lambda bhi, i: (bhi, 0, 0)),
                    pl.BlockSpec((1, L, D), lambda bhi, i: (bhi, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, D, BLOCK_Q), lambda bhi, i: (bhi, 0, i)),
            )(qr, kr, vr)
            return jnp.swapaxes(out.reshape(B, H, D, L), 2, 3)

        return fwd

    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D), jnp.bfloat16)

    def wall(fn):
        c = jax.jit(fn).lower(q).compile()
        float(jnp.asarray(c(q), jnp.float32)[0, 0, 0, 0])
        walls = []
        for _ in range(3):
            t0 = time.time()
            float(jnp.asarray(c(q), jnp.float32)[0, 0, 0, 0])
            walls.append(time.time() - t0)
        return sorted(walls)[1]

    def chain(call):
        def f(qq):
            def body(c, _):
                o = call(c, k, v)
                return jnp.clip(o, -3, 3).astype(jnp.bfloat16), ()
            out, _ = jax.lax.scan(body, qq, None, length=ITERS)
            return out
        return f

    def empty(qq):
        def body(c, _):
            return jnp.clip(c * 1.0000001, -3, 3), ()
        out, _ = jax.lax.scan(body, qq, None, length=ITERS)
        return out

    results = {"iters": ITERS, "shape": [B, H, L, D], "block_q": BLOCK_Q}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    if "empty_scan_s" not in results:
        results["empty_scan_s"] = round(wall(empty), 4)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    base = results["empty_scan_s"]

    variants = [
        ("module_full", lambda qq, kk, vv: flash_attention(qq, kk, vv, block_q=BLOCK_Q)),
        ("full", wrap(k_full)),
        ("no_exp", wrap(k_no_exp)),
        ("no_softmax", wrap(k_no_softmax)),
        ("no_av", wrap(k_no_av)),
        ("st_only", wrap(k_st_only)),
    ]
    for name, call in variants:
        if name in results:
            continue
        try:
            w = wall(chain(call))
        except Exception as e:  # Mosaic legality surprises: record, move on
            results[name] = {"error": str(e)[:200]}
            print(f"[{name}] FAIL {str(e)[:150]}", flush=True)
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
            continue
        us = (w - base) / ITERS * 1e6
        results[name] = {"per_call_us": round(us, 2), "scan_wall_s": round(w, 3)}
        print(f"[{name}] {us:.1f} us/call", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
