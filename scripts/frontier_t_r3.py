"""Re-measure the b512 serving frontier through the transposed pipeline.

The frontier_b512_r3.json dials (dpm14+cf1p 670.2, dpm20+cf2p 306.2
img/s) were measured before the transposed attention pipeline
(attn_t_ab_r3.json: +14.7% on the 35-NFE headline dial). This re-runs
the three frontier operating points — heun18+cf1p (headline),
dpm20+cf2p (quality), dpm14+cf1p (throughput) — at batch 512 with the
now-default transposed layout, same wall methodology (AOT engine sample,
median of 5, value-fetch barrier). FID is unchanged by layout (parity
3e-5, attn_t_fid_check.json); this is throughput-only, random-init
weights (throughput is weight-value-independent).
Writes artifacts/frontier_t_r3.json.
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/frontier_t_r3.json"
BATCH = 512
PROMPT = "a photo of a flower"


def main():
    import jax

    from hdmoe_tpu.models import default_model_config, precond_init
    from hdmoe_tpu.serve import SamplerEngine

    print("device:", jax.devices()[0], flush=True)
    base = default_model_config()
    params = jax.jit(lambda k: precond_init(k, base))(jax.random.PRNGKey(0))

    def fast(cf):
        return replace(base, compute_dtype="bfloat16", use_flash=True,
                       dispatch="capacity", capacity_factor=cf,
                       capacity_policy="priority")

    variants = [
        ("heun18_cf1p", fast(1.0), "heun", 18, 35),
        ("dpm20_cf2p", fast(2.0), "dpmpp2m", 20, 20),
        ("dpm14_cf1p", fast(1.0), "dpmpp2m", 14, 14),
    ]
    results = {"batch": BATCH, "layout": "t (transposed attention pipeline)"}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for name, cfg, solver, steps, nfe in variants:
        if name in results:
            continue
        try:
            t0 = time.time()
            engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=steps,
                                   vae_kind="fake", text_kind="fake", solver=solver)
            compile_s = time.time() - t0
            noise = jax.random.normal(
                jax.random.PRNGKey(1),
                (BATCH, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))
            text = engine.clip.encode_text([PROMPT] * BATCH)
            k = jax.random.PRNGKey(2)
            float(engine._sample(noise, text, k)[0, 0, 0, 0])
            walls = []
            for _ in range(5):
                t0 = time.time()
                float(engine._sample(noise, text, k)[0, 0, 0, 0])
                walls.append(time.time() - t0)
            wall = sorted(walls)[len(walls) // 2]
            results[name] = {"img_per_sec_chip": round(BATCH / wall, 1),
                             "sample_wall_s": round(wall, 4), "nfe": nfe,
                             "solver": solver, "compile_s": round(compile_s, 1)}
            print(f"[{name}] {results[name]}", flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:400]}
            print(f"[{name}] FAILED: {e}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
