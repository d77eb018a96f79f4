"""Round-2g: flagship sampler with the FUSED silu(+scale) Pallas conv.

Round-2d measured conv_impl="pallas" neutral (189.1 vs 188.8 img/s): the
pallas_call severed XLA's elementwise-producer fusions. The conv kernel now
fuses the U-Net block's silu / emb-scale prologue in VMEM
(mp_conv_silu_apply); re-measure the A/B.

Usage: python scripts/perf_round2g.py [outfile]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r2/round2g.json"
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


def main():
    from hdmoe_tpu.models import default_model_config, precond_init, precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser
    from hdmoe_tpu.train.optim import project_mp_weights

    log("device:", jax.devices()[0])
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
        log(f"sampler[conv={impl}+fusedsilu] compile {time.time()-t0:.0f}s")
        wall = timeit(sample, noise, n=5)
        results[f"sample_b32_conv_{impl}_fusedsilu_ips"] = batch / wall
        log(f"sampler conv={impl} (fused silu prologue): {wall:.4f} s -> {batch/wall:.1f} img/s")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log("DONE", json.dumps(results))


if __name__ == "__main__":
    main()
