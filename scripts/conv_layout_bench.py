"""Conv layout micro-benchmark on the real TPU chip.

PERF.md: conv fusions are ~60% of the denoiser eval post-flash, running at
36 TF/s aggregate. Hypothesis: small output-channel counts (O in {4,32,64})
cap MXU lane use at O/128; a transposed im2col matmul
(out^T = W(O, C*k*k) @ patches(C*k*k, tokens)) puts the large token
dimension on the lanes instead — at the cost of materializing the patch
matrix (k*k x activation bytes of extra HBM traffic unless fused).

Methodology (PERF.md tunnel caveat): each variant chains the op 200x inside
one compiled lax.scan and we report wall/200; sub-ms single-op timings
through the axon tunnel are garbage.

Shape classes swept = the flagship U-Net expert conv population (per-expert
capacity batch 8 at cf=1.0; channels 32/64/128 from channel_mult (1,2) +
mp_cat skips; k 3 and 5; spatial 32^2 and 16^2) plus the O=4 output
projection. All bf16.

Usage: python scripts/conv_layout_bench.py [outfile]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r2/conv_layout.json"
# ~10 ms of per-dispatch tunnel overhead swamps 200 iterations of a ~5 us op
# (first run of this script measured a flat ~50 us/op floor across ALL
# variants including pure matmuls — that was the dispatch, not the device).
# 4000 chained iterations + an empty-scan baseline subtraction isolate the
# per-op device time.
ITERS = 4000
DTYPE = jnp.bfloat16

# (tag, B, HW, C_in, O, k)
SHAPES = [
    ("enc32_k3", 8, 32, 32, 32, 3),
    ("enc64_k3", 8, 16, 64, 64, 3),
    ("enc32_k5", 8, 32, 32, 32, 5),
    ("enc64_k5", 8, 16, 64, 64, 5),
    ("dec128to64_k3", 8, 16, 128, 64, 3),
    ("dec64to32_k3", 8, 32, 64, 32, 3),
    ("outproj_O4_k3", 8, 32, 32, 4, 3),
    ("embed_C4_k3", 32, 32, 4, 32, 3),
]


def scan_wall(step, carry, n=3):
    def body(c, _):
        return step(c), None

    f = jax.jit(lambda c: lax.scan(body, c, None, length=ITERS)[0])
    r = f(carry)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(carry)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / (n * ITERS)


def variants(B, HW, C, O, k, w):
    """Each variant maps x -> y with a projection back to x's shape so the
    scan carry is well-typed; the projection matmul is identical across
    variants (reported times are the full chained step, comparable)."""
    pad = ((k // 2, (k - 1) - k // 2),) * 2  # stride-1 'same' (mp_conv)
    w_back = jax.random.normal(jax.random.PRNGKey(9), (C, O, 1, 1), DTYPE)

    def conv(x, dn, weight, p):
        return lax.conv_general_dilated(x, weight, (1, 1), p, dimension_numbers=dn)

    def nhwc(x):
        y = conv(x, ("NHWC", "OIHW", "NHWC"), w, pad)
        return conv(y, ("NHWC", "OIHW", "NHWC"), w_back, ((0, 0), (0, 0)))

    def nchw(x):
        y = conv(x, ("NCHW", "OIHW", "NCHW"), w, pad)
        return conv(y, ("NCHW", "OIHW", "NCHW"), w_back, ((0, 0), (0, 0)))

    w2d = w.reshape(O, C * k * k)
    wb2d = w_back.reshape(C, O)

    def im2col_t(x_nchw):
        p = lax.conv_general_dilated_patches(
            x_nchw, (k, k), (1, 1), pad, dimension_numbers=("NCHW", "OIHW", "NCHW"))
        p = p.reshape(B, C * k * k, HW * HW)
        y = jnp.einsum("ok,bkn->bon", w2d, p,
                       preferred_element_type=jnp.float32).astype(DTYPE)
        x2 = jnp.einsum("co,bon->bcn", wb2d, y,
                        preferred_element_type=jnp.float32).astype(DTYPE)
        return x2.reshape(B, C, HW, HW)

    from hdmoe_tpu.ops.pallas.conv import conv_same, supported

    def pallas(x):
        y = conv_same(x, w)
        return conv(y, ("NHWC", "OIHW", "NHWC"), w_back, ((0, 0), (0, 0)))

    out = {"nhwc": nhwc, "nchw": nchw, "im2col_t": im2col_t}
    if supported((B, HW, HW, C), w.shape, 1):
        out["pallas"] = pallas
    return out


def main():
    print("device:", jax.devices()[0], flush=True)
    results = {}
    # dispatch/loop overhead baseline: same scan, near-empty body
    x0 = jnp.ones((8, 128), DTYPE)
    base = scan_wall(lambda c: c + 1.0, x0)
    results["empty_scan_baseline_us"] = round(base * 1e6, 3)
    print(f"empty-scan baseline: {base*1e6:.2f} us/iter", flush=True)
    for tag, B, HW, C, O, k in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, C), DTYPE)
        w = jax.random.normal(jax.random.PRNGKey(1), (O, C, k, k), DTYPE)
        flops = 2 * B * HW * HW * C * O * k * k + 2 * B * HW * HW * C * O
        vs = variants(B, HW, C, O, k, w)
        x_nchw = jnp.transpose(x, (0, 3, 1, 2))
        for name, fn in vs.items():
            carry = x_nchw if name in ("nchw", "im2col_t") else x
            try:
                ms = max(scan_wall(fn, carry) - base, 1e-9) * 1e3
            except Exception as e:  # keep measuring the other variants
                results[f"{tag}/{name}"] = {"error": str(e)[:200]}
                print(f"{tag:16} {name:9} FAILED: {str(e)[:120]}", flush=True)
                continue
            tfs = flops / (ms * 1e-3) / 1e12
            results[f"{tag}/{name}"] = {"ms": round(ms, 5), "tfs": round(tfs, 2)}
            print(f"{tag:16} {name:9} {ms:8.4f} ms  {tfs:6.1f} TF/s", flush=True)

    # pure-matmul lane controls (chained pairs, conv-equivalent FLOPs)
    B, HW, C, O, k = 8, 32, 32, 32, 3
    a = jax.random.normal(jax.random.PRNGKey(0), (B * HW * HW, C * k * k), DTYPE)
    w2d = jax.random.normal(jax.random.PRNGKey(1), (O, C * k * k), DTYPE)
    wt = w2d.T
    flops = 2 * B * HW * HW * C * O * k * k

    def mm_pair_lanes(a_):
        r = (a_ @ wt).astype(DTYPE)
        return (r @ w2d).astype(DTYPE)

    at = a.T

    def mm_pair_t(at_):
        r = (w2d @ at_).astype(DTYPE)
        return (wt @ r).astype(DTYPE)

    for name, fn, carry in (("matmul_pair_lanes", mm_pair_lanes, a),
                            ("matmul_pair_t", mm_pair_t, at)):
        ms = max(scan_wall(fn, carry) - base, 1e-9) * 1e3 / 2
        tfs = flops / (ms * 1e-3) / 1e12
        results[name] = {"ms": round(ms, 5), "tfs": round(tfs, 2)}
        print(f"{name}: {ms:.4f} ms ({tfs:.1f} TF/s)", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
