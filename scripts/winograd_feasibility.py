"""Winograd F(2x2,3x3) feasibility measurement (VERDICT item 1b).

OUTCOME (recorded in artifacts/winograd_feasibility.json): the scan A/B
below could NOT isolate the matmuls — both scans are dominated by the
multi-MB carry HBM traffic, so baseline-subtracted deltas read ~0. The
artifact instead records the decisive roofline arithmetic: at C=32 the
Winograd matmuls contract over K=32 (25% of the 128-deep MXU pipeline),
turning the 2.25x MAC reduction into a 1.78x compute-time LOSS vs im2col's
K=288. REFUTED; kept as the record of the measurement attempt.

Winograd rewrites a 3x3 conv as 16 independent per-tile-position matmuls:
  out_tiles[p] = in_tiles[p] @ W_t[p],  p = 0..15,
with in_tiles (T, C_in) per position (T = B*H*W/4 2x2-output tiles) and
W_t (C_in, C_out) — 16*T*C_in*C_out MACs vs im2col's 9*(4T)*C_in*C_out:
a 2.25x FLOP reduction. Whether that wins on the MXU depends entirely on
the achievable rate at the Winograd shape: the contraction dim drops from
k*k*C = 288 to C = 32, and K=32 uses a quarter of the 128-deep systolic
array.

This script measures, with the 4000-iteration scan + empty-baseline
methodology (micro-bench caveat, PERF.md):

  1. im2col matmul      (8192, 288) x (288, 32)   [the pallas conv's core]
  2. winograd batched   (16, 2048, 32) x (16, 32, 32)
  3. winograd merged    (2048, 512) x block-diag — approximated by
     (16*2048, 32) x (32, 32) single matmul (same MXU shape class)
  4. input-transform cost proxy: 16 shifted adds over the (C, HW) image
     (the B^T d B butterflies are ~32 adds/tile on the VPU)

Projected winograd conv time = (2) + (4) + output transform (~(4)/2).
Compare against the measured 12.9 us pallas / 19.2 us XLA enc32_k3 conv.

Usage: python scripts/winograd_feasibility.py [out_json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/winograd_feasibility.json"
ITERS = 4000


def scan_time(fn, *args):
    """Median wall of a 4000-iteration scan minus the empty-scan baseline."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chain(body):
        def run(*xs):
            def step(c, _):
                return body(*c), None

            out, _ = lax.scan(step, xs, None, length=ITERS)
            return out

        return jax.jit(run)

    def barrier(o):  # value fetch (PERF.md timing-barrier caveat)
        import numpy as _np
        leaf = jax.tree_util.tree_leaves(o)[0]
        _np.asarray(leaf).ravel()[:1]

    f = chain(fn)
    barrier(f(*args))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        barrier(f(*args))
        walls.append(time.perf_counter() - t0)
    full = sorted(walls)[1]

    # near-empty scan baseline with the same carry structure
    b = chain(lambda *xs: tuple(x + 0 for x in xs))
    barrier(b(*args))
    walls_b = []
    for _ in range(3):
        t0 = time.perf_counter()
        barrier(b(*args))
        walls_b.append(time.perf_counter() - t0)
    base = sorted(walls_b)[1]
    return max(full - base, 0.0) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    B, H, W, C, O = 8, 32, 32, 32, 32
    T = B * (H // 2) * (W // 2)  # 2048 2x2-output tiles

    results = {}

    # 1. im2col core matmul
    wt = jax.random.normal(key, (288, O), dt)
    pat = jax.random.normal(key, (B * H * W, 288), dt)

    def mm(p, w):
        y = (p @ w).astype(dt)
        # feed back a same-shaped carry so the scan cannot hoist the matmul
        p2 = p.at[:, :O].add(y)
        return p2, w

    results["im2col_8192x288x32_us"] = scan_time(mm, pat, wt) * 1e6

    # 2. winograd batched matmul (16, T, C) x (16, C, O)
    wt16 = jax.random.normal(key, (16, C, O), dt)
    tiles = jax.random.normal(key, (16, T, C), dt)

    def bmm(p, w):
        y = jnp.einsum("ptc,pco->pto", p, w).astype(dt)
        return p.at[:, :, :O].add(y), w

    results["winograd_16x2048x32x32_us"] = scan_time(bmm, tiles, wt16) * 1e6

    # 3. same MACs as (2) in one flat matmul (scheduling-overhead control)
    flat = jax.random.normal(key, (16 * T, C), dt)
    w1 = jax.random.normal(key, (C, O), dt)

    def fmm(p, w):
        y = (p @ w).astype(dt)
        return p.at[:, :O].add(y), w

    results["winograd_flat_32768x32x32_us"] = scan_time(fmm, flat, w1) * 1e6

    # 4. input-transform proxy: 16 masked shifted adds on (C, B*HW)
    img = jax.random.normal(key, (C, B * H * W), dt)

    def shifts(x):
        acc = x
        for s in (1, 2, W, W + 1, 2 * W, 2 * W + 2, 3, W + 3):
            acc = acc + jnp.roll(x, -s, axis=1) - jnp.roll(x, s, axis=1)
        return acc

    results["transform_proxy_us"] = scan_time(lambda x: (shifts(x),), img) * 1e6

    # reference points
    results["reference"] = {
        "pallas_im2col_conv_us": 12.9,
        "xla_conv_us": 19.2,
        "note": "enc32_k3 class, artifacts/profile_r2/conv_layout3.json",
    }
    proj = (results["winograd_16x2048x32x32_us"]
            + 1.5 * results["transform_proxy_us"])
    results["winograd_projected_us"] = proj
    results["verdict"] = (
        "winograd plausibly faster" if proj < 12.9 * 0.85 else
        "winograd not worth a kernel" if proj > 12.9 else "marginal")
    for k, v in results.items():
        print(k, v, flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
