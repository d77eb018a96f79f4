"""Round-2c: single-pass small-head flash backward on the real chip.

1. Numeric check of the new _smallhead_backward vs XLA autodiff on real
   TPU (non-interpret) — catches Mosaic layout legality issues the CPU
   interpreter can't.
2. Re-measure the text_guided_64 train step (dense vs flash) with the new
   kernel. Prior measurement (round2b): dense 41.7 ms, 3-pass fused flash
   231.5 ms at batch 4 — grid/DMA overhead at tiny d; the single-pass
   kernel replaces it.

Usage: python scripts/perf_round2c.py [outfile]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r2/round2c.json"
results = {}


def log(*a):
    print(*a, flush=True)


def numeric_check():
    from hdmoe_tpu.ops.pallas.flash_attention import _attention_reference, flash_attention

    for lq, lk, d in ((300, 2100, 4), (1024, 1024, 4), (4096, 4096, 4)):
        key = jax.random.PRNGKey(lq)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (2, 2, lq, d), jnp.float32)
        k = jax.random.normal(ks[1], (2, 2, lk, d), jnp.float32)
        v = jax.random.normal(ks[2], (2, 2, lk, d), jnp.float32)

        gf = jax.jit(jax.grad(lambda *t: jnp.sum(flash_attention(*t) ** 2), argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(lambda *t: jnp.sum(_attention_reference(*t, None) ** 2), argnums=(0, 1, 2)))(q, k, v)
        worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gf, gr))
        scale = max(float(jnp.max(jnp.abs(b))) for b in gr)
        log(f"smallhead bwd TPU check lq={lq} lk={lk} d={d}: worst abs diff {worst:.3e} (ref scale {scale:.1f})")
        results[f"bwd_check_{lq}_{lk}_maxdiff"] = worst
        assert worst < 2e-2 * max(scale, 1.0), "grad mismatch on real TPU"


def main():
    log("device:", jax.devices()[0])
    numeric_check()
    from perf_round2b import train_step_text64, results as r2b_results
    train_step_text64()
    results.update(r2b_results)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log("DONE", json.dumps(results))


if __name__ == "__main__":
    main()
