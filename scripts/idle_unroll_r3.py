"""Round-3 IDLE chase: lax.scan unroll factor on the 35-NFE sampler.

The round-2 xplane traces put 8-11% of sampler time in IDLE scheduling gaps
(artifacts/profile_r2*, PERF.md "Remaining headroom"). ``scan_unroll=k``
replicates the Heun body k times per loop iteration, letting XLA software-
pipeline one step's epilogue against the next step's prologue. The math is
bit-identical (tests/test_sampler.py::test_scan_unroll_bit_identical); this
measures whether the pipelining moves the wall on real hardware.

Same methodology as bench.py's fast path (AOT compile, value-fetch timing
barrier — block_until_ready lies through the tunnel). unroll=1 is the
in-session control, so host load cancels out of the ratios.

Writes artifacts/idle_unroll_r3.json.
"""

import json
import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

BATCH, HEUN_STEPS = 32, 18
N_RUNS = 4


def main():
    from hdmoe_tpu.models import default_model_config, precond_apply, precond_init
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser
    from hdmoe_tpu.train.optim import project_mp_weights

    key = jax.random.PRNGKey(0)
    base = default_model_config()
    params = project_mp_weights(jax.jit(lambda k: precond_init(k, base))(key))
    cfg = replace(
        base, compute_dtype="bfloat16", dispatch="capacity",
        capacity_factor=1.0, use_flash=True, capacity_policy="priority",
    )
    text = jax.random.normal(key, (BATCH, 77, cfg.text_emb_dim))
    noise = jax.random.normal(
        key, (BATCH, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))

    def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
        return precond_apply(params, cfg, x, sigma, text_emb, m1, m2, zeta,
                             transition_point=transition_point, softness=softness)

    denoiser = make_denoiser(precond_fn, cfg.num_experts,
                             transition_point=-1.2, softness=1.6)

    results = {}
    for unroll in (1, 2, 4):
        scfg = EDMSamplerConfig(num_steps=HEUN_STEPS, scan_unroll=unroll)
        t0 = time.perf_counter()
        with mp_ops.prenormalized_weights():
            sample = jax.jit(
                lambda n: edm_sample(denoiser, n, text, scfg)
            ).lower(noise).compile()
        compile_s = time.perf_counter() - t0
        out = sample(noise)
        float(out[0, 0, 0, 0])  # value-fetch barrier (never block_until_ready)
        t0 = time.perf_counter()
        for _ in range(N_RUNS):
            out = sample(noise)
        float(out[0, 0, 0, 0])
        wall = (time.perf_counter() - t0) / N_RUNS
        results[f"unroll{unroll}"] = {
            "images_per_sec": round(BATCH / wall, 2),
            "wall_s_per_batch": round(wall, 4),
            "eval_ms": round(wall / (2 * HEUN_STEPS - 1) * 1e3, 3),
            "compile_s": round(compile_s, 1),
        }
        print(f"[idle_unroll] unroll={unroll}: {results[f'unroll{unroll}']}",
              flush=True)

    out_path = Path("artifacts/idle_unroll_r3.json")
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(json.dumps(
        {"method": "35-NFE fast-path sampler wall (priority+cf1.0+bf16+flash, "
                   "batch 32), value-fetch barrier, mean of "
                   f"{N_RUNS} runs; unroll=1 is the in-session control",
         "results": results}, indent=2))
    print(f"[idle_unroll] wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
