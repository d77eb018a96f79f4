"""Frontier dials re-measured with dispatch="einsum" (walls only).

The round-3 frontier (frontier_b512_r3.json / frontier_t_r3.json) priced
dpm14+cf1p at 670-749 img/s and dpm20+cf2p at 306-327 img/s with the
gather/scatter capacity dispatch. einsum dispatch is bit-grade equal
(tests/test_moe.py), so FIDs carry over; this re-measures ONLY the b512
compiled solver walls, plus a capacity control for same-session scaling.

Usage: python scripts/frontier_einsum_r4.py [out_json]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/frontier_einsum_r4.json"
BATCH = 512


def main():
    import jax

    from hdmoe_tpu.models import default_model_config, precond_init, precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import make_denoiser
    from hdmoe_tpu.sampler import EDMSamplerConfig
    from hdmoe_tpu.sampler.dpm import dpmpp_2m_sample
    from hdmoe_tpu.train.optim import project_mp_weights

    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    base = default_model_config()
    params = project_mp_weights(jax.jit(lambda k: precond_init(k, base))(key))
    text = jax.random.normal(key, (BATCH, 77, base.text_emb_dim))
    noise = jax.random.normal(key, (BATCH, base.img_resolution,
                                    base.img_resolution, base.in_channels))

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    arms = [
        ("dpm14_cf1p_capacity_control", "capacity", 1.0, 14),
        ("dpm14_cf1p_einsum", "einsum", 1.0, 14),
        ("dpm20_cf2p_einsum", "einsum", 2.0, 20),
    ]
    for tag, dispatch, cf, steps in arms:
        if tag in results:
            print(f"[{tag}] skip", flush=True)
            continue
        cfg = replace(base, compute_dtype="bfloat16", dispatch=dispatch,
                      capacity_factor=cf, use_flash=True,
                      capacity_policy="priority")

        def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
            return precond_apply(params, cfg, x, sigma, text_emb, m1, m2, zeta,
                                 transition_point=transition_point, softness=softness)

        den = make_denoiser(precond_fn, cfg.num_experts,
                            transition_point=-1.2, softness=1.6)
        t0 = time.time()
        with mp_ops.prenormalized_weights():
            sample = jax.jit(
                lambda n: dpmpp_2m_sample(den, n, text, EDMSamplerConfig(num_steps=steps, s_churn=0.0))
            ).lower(noise).compile()
        compile_s = time.time() - t0
        float(sample(noise)[0, 0, 0, 0])
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(sample(noise)[0, 0, 0, 0])
            walls.append(time.perf_counter() - t0)
        wall = sorted(walls)[1]
        results[tag] = {"img_per_sec": round(BATCH / wall, 1),
                        "wall_s": round(wall, 3), "nfe": steps,
                        "compile_s": round(compile_s, 1)}
        print(f"[{tag}] {results[tag]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
