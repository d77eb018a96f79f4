"""Throughput-optimal serving batch for the round-3 fast path.

The 207 img/s headline is batch 32 — inherited from round 1, where batch 64
was measured SLOWER (124 vs 126, BUT pre-flash at cf=2.0: the attention
logits were HBM-bound, so doubling the batch doubled the dominant traffic).
The round-3 fast path (flash + cf=1.0 + priority) removed that traffic
term, and the remaining conv wall is compute-side at small row counts
(C=32 convs fill 32/128 MXU sublanes per PERF.md) — a LARGER batch may now
help, not hurt. Round 3 only re-tried b64 *banked* (180.2, but banking
itself costs ~15 img/s vs control, artifacts/perf_round3.json), never the
plain fast path.

Sweeps batch {16, 32, 64, 128} on the plain fast path, reporting
img/s/chip from one compiled 35-NFE scan wall (median of 3, folded
weights, value-fetch barrier). Reference anchor for the sampler of
record: /root/reference/Utils/training.py:313.

Usage: python scripts/batch_sweep_r3.py [out_json]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/batch_sweep_r3.json"
HEUN_STEPS = 18


def measure(cfg, params, batch):
    import jax

    from hdmoe_tpu.models import precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser

    key = jax.random.PRNGKey(0)
    text = jax.random.normal(key, (batch, 77, cfg.text_emb_dim))
    noise = jax.random.normal(
        key, (batch, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))

    def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
        return precond_apply(
            params, cfg, x, sigma, text_emb, m1, m2, zeta,
            transition_point=transition_point, softness=softness,
        )

    den = make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)
    scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)
    t0 = time.time()
    with mp_ops.prenormalized_weights():
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
        "img_per_sec": round(batch / wall, 1),
        "wall_s": round(wall, 4),
        "ms_per_eval": round(wall / (2 * HEUN_STEPS - 1) * 1e3, 3),
        "batch": batch,
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
    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for batch in (16, 32, 64, 128):
        name = f"fast_b{batch}"
        if name in results:
            continue
        try:
            results[name] = measure(fast, folded, batch)
            print(f"[{name}] {results[name]}", flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:500]}
            print(f"[{name}] FAILED: {e}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
