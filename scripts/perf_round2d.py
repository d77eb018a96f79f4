"""Round-2d TPU measurements.

1. Flagship 35-NFE sampler A/B: conv_impl "xla" vs "pallas" (the
   VMEM-im2col conv kernel, ops/pallas/conv.py) on the fast config
   (bf16 + capacity cf=1.0 + flash). Prior best: 183.9 img/s.
2. text_guided_64 train step, dense vs flash, with the single-pass
   small-head backward at its fixed block ladder (block_q=64 at Lk 4096;
   the 128 ladder OOM'd scoped VMEM inside the train step).

Usage: python scripts/perf_round2d.py [outfile]
"""

import contextlib
import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r2/round2d.json"
results = {}


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def sampler_conv_ab():
    from hdmoe_tpu.models import default_model_config, precond_init, precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser
    from hdmoe_tpu.train.optim import project_mp_weights

    batch = 32
    base = default_model_config(compute_dtype="bfloat16", dispatch="capacity",
                                capacity_factor=1.0, use_flash=True)
    params = jax.jit(lambda k: precond_init(k, base))(jax.random.PRNGKey(0))
    fparams = project_mp_weights(params)
    text = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, base.text_emb_dim))
    noise = jax.random.normal(jax.random.PRNGKey(2), (batch, 32, 32, 4))

    for impl in ("xla", "pallas"):
        cfg = replace(base, conv_impl=impl)

        def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
            return precond_apply(fparams, cfg, x, sigma, text_emb, m1, m2, zeta,
                                 transition_point=transition_point, softness=softness)

        den = make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)
        t0 = time.time()
        with mp_ops.prenormalized_weights():
            sample = jax.jit(
                lambda n: edm_sample(den, n, text, EDMSamplerConfig(num_steps=18))
            ).lower(noise).compile()
        log(f"sampler[conv={impl}] compile {time.time()-t0:.0f}s")
        wall = timeit(sample, noise, n=5)
        ips = batch / wall
        results[f"sample_b32_conv_{impl}_ips"] = ips
        results[f"sample_b32_conv_{impl}_eval_ms"] = wall / 35 * 1e3
        log(f"sampler conv={impl}: {wall:.4f} s -> {ips:.1f} img/s ({wall/35*1e3:.2f} ms/eval)")


def main():
    log("device:", jax.devices()[0])
    sampler_conv_ab()
    from perf_round2b import train_step_text64, results as r2b_results
    train_step_text64()
    results.update(r2b_results)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log("DONE", json.dumps(results))


if __name__ == "__main__":
    main()
