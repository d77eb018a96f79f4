"""A/B: dispatch="einsum" (one-hot MXU matmuls) vs "capacity" (gather/
scatter) on the flagship b512 fast-path sampler wall.

Roofline motivation (artifacts/roofline_ceiling_r4.json): the capacity
path's token movement (gather 320 GB/s, scatter-add 146 GB/s, gate-weight
mul 202 GB/s) totals ~4 ms of the 46 ms denoiser eval at 18-40% of HBM
peak; the einsum lowering folds the weight multiply into an MXU combine
contraction. Prior pallas/grouped attempts measured SLOWER at b32 —
this is the untried XLA-native lowering at the b512 regime.

Method: compiled 35-NFE scan walls (median of 3), value-fetch barriers,
same config/params/noise across arms. Also records a capacity control so
the A/B is same-session (tunnel load varies across sessions).

Usage: python scripts/einsum_dispatch_ab_r4.py [out_json]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/einsum_dispatch_ab_r4.json"
BATCH = 512
HEUN_STEPS = 18


def main():
    import jax

    from hdmoe_tpu.models import default_model_config, precond_init, precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser
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

    for tag, dispatch in (("capacity_control", "capacity"), ("einsum", "einsum")):
        if tag in results:
            print(f"[{tag}] already recorded, skipping", flush=True)
            continue
        cfg = replace(base, compute_dtype="bfloat16", dispatch=dispatch,
                      capacity_factor=1.0, use_flash=True,
                      capacity_policy="priority")

        def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
            return precond_apply(params, cfg, x, sigma, text_emb, m1, m2, zeta,
                                 transition_point=transition_point, softness=softness)

        den = make_denoiser(precond_fn, cfg.num_experts,
                            transition_point=-1.2, softness=1.6)
        scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)
        t0 = time.time()
        with mp_ops.prenormalized_weights():
            sample = jax.jit(lambda n: edm_sample(den, n, text, scfg)).lower(noise).compile()
        compile_s = time.time() - t0
        out = sample(noise)
        float(out[0, 0, 0, 0])
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(sample(noise)[0, 0, 0, 0])
            walls.append(time.perf_counter() - t0)
        wall = sorted(walls)[1]
        results[tag] = {"img_per_sec": round(BATCH / wall, 1),
                        "sample_wall_s": round(wall, 3),
                        "compile_s": round(compile_s, 1),
                        "batch": BATCH, "nfe": 2 * HEUN_STEPS - 1}
        print(f"[{tag}] {results[tag]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
