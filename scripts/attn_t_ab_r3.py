"""A/B: transposed attention pipeline (attn_layout "t") vs standard, b512.

profile_r3_b512 found ~12% of sampler device time in XLA layout copies
({2,1,3,0}->{3,2,1,0} on bf16[512,8,1024,4], ~1.6 ms each at 8-byte run
granularity) bracketing the small-head flash kernel, and
flash_decompose_b512.json showed the kernel itself is matmul-bound (exp
0.3%, softmax 13.6%) with no block-shape headroom. The transposed
pipeline (ops/attention.py attn_layout, ops/pallas/flash_attention.py
flash_attention_t) removes those copies: projections emit their natural
L-minor output, the kernel consumes (B, H, d, L) bitcasts, the
out-projection contracts the transposed result.

Measures the 35-NFE fast-path scan wall at batch 512 for both layouts in
ONE session (same host load), median of 3, value-fetch barrier.
Writes artifacts/attn_t_ab_r3.json.
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/attn_t_ab_r3.json"
HEUN_STEPS = 18
BATCH = 512


def measure(cfg, params, layout):
    import jax

    from hdmoe_tpu.models import precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.ops.attention import attn_layout
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser

    key = jax.random.PRNGKey(0)
    text = jax.random.normal(key, (BATCH, 77, cfg.text_emb_dim))
    noise = jax.random.normal(
        key, (BATCH, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))

    def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
        return precond_apply(
            params, cfg, x, sigma, text_emb, m1, m2, zeta,
            transition_point=transition_point, softness=softness,
        )

    den = make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)
    scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)
    t0 = time.time()
    with mp_ops.prenormalized_weights(), attn_layout(layout):
        sample = jax.jit(lambda n: edm_sample(den, n, text, scfg)).lower(noise).compile()
    compile_s = time.time() - t0
    float(sample(noise)[0, 0, 0, 0])  # warm + barrier (value fetch, PERF.md caveat)
    walls = []
    for _ in range(3):
        t0 = time.time()
        float(sample(noise)[0, 0, 0, 0])
        walls.append(time.time() - t0)
    wall = sorted(walls)[1]
    return {
        "img_per_sec": round(BATCH / wall, 1),
        "wall_s": round(wall, 4),
        "ms_per_eval": round(wall / (2 * HEUN_STEPS - 1) * 1e3, 3),
        "compile_s": round(compile_s, 1),
    }


def main():
    import jax

    from hdmoe_tpu.models import default_model_config, precond_init
    from hdmoe_tpu.train.optim import project_mp_weights

    print("device:", jax.devices()[0], flush=True)
    base = default_model_config()
    params = jax.jit(lambda k: precond_init(k, base))(jax.random.PRNGKey(0))
    folded = project_mp_weights(params)

    fast = replace(base, compute_dtype="bfloat16", use_flash=True,
                   dispatch="capacity", capacity_factor=1.0,
                   capacity_policy="priority")
    results = {"batch": BATCH, "nfe": 2 * HEUN_STEPS - 1}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for layout in ("std", "t"):
        name = f"fast_b512_{layout}"
        if name in results:
            continue
        try:
            results[name] = measure(fast, folded, layout)
            print(f"[{name}] {results[name]}", flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:500]}
            print(f"[{name}] FAILED: {e}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
