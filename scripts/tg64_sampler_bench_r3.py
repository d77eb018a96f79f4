"""Sampler throughput at the text_guided_64 config (seq-4096 fusion attn).

The perf story so far benchmarks sampling only at the flagship latent
32x32x4 config; text_guided_64 (64x64 pixels, fusion attention at seq
4096, CLIP-dim text conditioning) has train-step numbers (round2e) but
no sampling throughput. Same methodology as bench.py: 35-NFE Heun scan
walls, value-fetch barriers, fast path = bf16 + flash(-t default) +
cf1-priority on folded weights, batch swept for the knee.

Usage: python scripts/tg64_sampler_bench_r3.py [out_json]
"""

import contextlib
import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/tg64_sampler_r3.json"
HEUN_STEPS = 18  # 35 NFE


def main():
    import jax
    import jax.numpy as jnp

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.optim import project_mp_weights
    from hdmoe_tpu.models import precond_apply

    print("device:", jax.devices()[0], flush=True)
    base_cfg, *_ = presets.text_guided_64(total_steps=1000)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: precond_init(k, base_cfg))(key)

    results = {"config": "text_guided_64 (64x64x3, seq-4096 fusion attn)",
               "nfe": 2 * HEUN_STEPS - 1}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    fast_cfg = replace(base_cfg, compute_dtype="bfloat16", dispatch="capacity",
                       capacity_factor=1.0, capacity_policy="priority", use_flash=True)
    folded = project_mp_weights(params)

    arms = [("fast_b%d" % b, fast_cfg, folded, True, b) for b in (16, 32, 64, 128)]
    # one parity anchor at a moderate batch for a vs_baseline-style ratio
    arms.append(("parity_f32_dense_b32", base_cfg, params, False, 32))

    for name, cfg, p, fold, batch in arms:
        if name in results:
            continue
        try:
            def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness,
                           _p=p, _cfg=cfg):
                return precond_apply(_p, _cfg, x, sigma, text_emb, m1, m2, zeta,
                                     transition_point=transition_point, softness=softness)

            denoiser = make_denoiser(precond_fn, cfg.num_experts,
                                     transition_point=-1.2, softness=1.6)
            scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)
            text = jax.random.normal(key, (batch, 77, cfg.text_emb_dim))
            noise = jax.random.normal(key, (batch, cfg.img_resolution,
                                            cfg.img_resolution, cfg.in_channels))
            ctx = mp_ops.prenormalized_weights if fold else contextlib.nullcontext
            t0 = time.time()
            with ctx():
                sample = jax.jit(lambda n: edm_sample(denoiser, n, text, scfg)).lower(noise).compile()
            out = sample(noise)
            float(out[0, 0, 0, 0])  # value-fetch barrier (PERF.md tunnel caveat)
            compile_s = time.time() - t0

            n_runs = max(2, int(24 // max(1, batch / 32)))
            t0 = time.perf_counter()
            for _ in range(n_runs):
                out = sample(noise)
            float(out[0, 0, 0, 0])
            wall = (time.perf_counter() - t0) / n_runs
            results[name] = {
                "batch": batch,
                "img_per_sec_chip": round(batch / wall, 1),
                "sample_wall_s": round(wall, 4),
                "runs": n_runs,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            results[name] = {"batch": batch, "error": f"{type(e).__name__}: {e}"[:400]}
        print(f"[{name}] {results[name]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
