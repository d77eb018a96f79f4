"""block_q sweep for the small-head flash kernel at the b512 grid.

The b512 profile (artifacts/profile_r3_b512) puts the small-head flash
kernel at ~54% of device self-time; its block_q=256 default was chosen on
the b32 grid. At b512 the grid is (bh=4096, Lq/block_q) — wider grid,
same VMEM budget per step — so the ladder deserves a re-sweep on the
dominant shape, the fusion cross-attention (B, 8, 1024, d=4).

Methodology: >=2000 iterations chained in ONE lax.scan with a data
dependence, minus an empty-scan baseline (CLAUDE.md micro-benchmark
rule). Writes artifacts/flash_blockq_b512.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/flash_blockq_b512.json"
B, H, L, D = 512, 8, 1024, 4
ITERS = 2000


def main():
    import jax
    import jax.numpy as jnp

    from hdmoe_tpu.ops.pallas.flash_attention import flash_attention

    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, H, L, D), jnp.bfloat16)

    def wall(fn):
        c = jax.jit(fn).lower(q).compile()
        float(jnp.asarray(c(q), jnp.float32)[0, 0, 0, 0])
        walls = []
        for _ in range(3):
            t0 = time.time()
            float(jnp.asarray(c(q), jnp.float32)[0, 0, 0, 0])
            walls.append(time.time() - t0)
        return sorted(walls)[1]

    def chain(bq):
        def f(qq):
            def body(c, _):
                o = flash_attention(c, k, v, block_q=bq)
                # data dependence: feed the output back as q (same shape)
                return o.astype(jnp.bfloat16), ()
            out, _ = jax.lax.scan(body, qq, None, length=ITERS)
            return out
        return f

    def empty(qq):
        def body(c, _):
            return c * 1.0000001, ()
        out, _ = jax.lax.scan(body, qq, None, length=ITERS)
        return out

    base = wall(empty)
    results = {"empty_scan_s": round(base, 4), "iters": ITERS,
               "shape": [B, H, L, D]}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for bq in (128, 256, 512, 1024):
        name = f"block_q_{bq}"
        if name in results:
            continue
        try:
            w = wall(chain(bq))
        except Exception as e:
            results[name] = {"error": str(e)[:160]}
            print(f"[{name}] FAIL {str(e)[:120]}", flush=True)
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
