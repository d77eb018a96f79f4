"""Round-2 TPU perf experiments for the flagship 35-NFE sampler.

Driven by the artifacts/profile_r2 evidence: per denoiser eval (~7.2 ms
in-scan), convs are ~46% (compute, 36 TF/s) and fusion-attention softmax
HBM traffic is ~48% (sub + bhqk/bhkd dot_generals at ~700 GB/s). The lever
is the re-tuned flash kernel (native-dtype MXU passes, 16-lane head padding).

Measures in ONE session (TPU compiles are slow; batch everything):
  1. attention-core micro-bench: XLA vs flash at (32, 8, 1024, 4) bf16
  2. denoiser-eval ms for config variants (flash on/off x capacity factor)
  3. full 35-NFE sampler wall for the winning variant

Usage: python scripts/perf_experiments.py [outfile]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r2/experiments.json"
BATCH = 32
HEUN_STEPS = 18
results = {}


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, n=20):
    # Device-side timing: block_until_ready only. NEVER np.asarray here —
    # a D2H pull through the slow axon tunnel adds ~10 ms of transfer noise
    # per sample and swamps the measurement.
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def micro_attention():
    from hdmoe_tpu.ops.pallas.flash_attention import _attention_reference, flash_attention

    b, h, l, d = 32, 8, 1024, 4
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)

    xla = jax.jit(lambda q, k, v: _attention_reference(q, k, v, None))
    t_xla = timeit(xla, q, k, v)
    log(f"attention core XLA:  {t_xla*1e3:.3f} ms")
    results["attn_xla_ms"] = t_xla * 1e3

    for bq, bk in ((256, 512), (512, 1024), (1024, 1024), (256, 1024)):
        try:
            fl = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(q, k, v, block_q=bq, block_k=bk))
            t_fl = timeit(fl, q, k, v)
            log(f"attention core flash bq={bq} bk={bk}: {t_fl*1e3:.3f} ms")
            results[f"attn_flash_{bq}_{bk}_ms"] = t_fl * 1e3
            # numerics guard
            err = float(jnp.max(jnp.abs(fl(q, k, v).astype(jnp.float32) - xla(q, k, v).astype(jnp.float32))))
            results[f"attn_flash_{bq}_{bk}_maxerr"] = err
            log(f"  maxerr vs XLA: {err:.5f}")
        except Exception as e:
            log(f"  flash bq={bq} bk={bk} FAILED: {repr(e)[:200]}")
            results[f"attn_flash_{bq}_{bk}_ms"] = None


def model_variants():
    import contextlib

    from hdmoe_tpu.models import default_model_config, precond_init, precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser
    from hdmoe_tpu.train.optim import project_mp_weights

    key = jax.random.PRNGKey(0)
    base_cfg = default_model_config()
    t0 = time.time()
    params = jax.jit(lambda k: precond_init(k, base_cfg))(key)
    jax.block_until_ready(params)
    log(f"init {time.time()-t0:.0f}s")
    fparams = project_mp_weights(params)
    text = jax.random.normal(key, (BATCH, 77, base_cfg.text_emb_dim))
    noise = jax.random.normal(
        key, (BATCH, base_cfg.img_resolution, base_cfg.img_resolution, base_cfg.in_channels)
    )
    sigma = jnp.full((BATCH, 1, 1, 1), 0.5)

    def make_den(cfg):
        def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
            return precond_apply(fparams, cfg, x, sigma, text_emb, m1, m2, zeta,
                                 transition_point=transition_point, softness=softness)

        from hdmoe_tpu.sampler import make_denoiser

        return make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)

    variants = {
        "cap2": replace(base_cfg, compute_dtype="bfloat16", dispatch="capacity", capacity_factor=2.0),
        "cap2_flash": replace(base_cfg, compute_dtype="bfloat16", dispatch="capacity", capacity_factor=2.0, use_flash=True),
        "cap1_flash": replace(base_cfg, compute_dtype="bfloat16", dispatch="capacity", capacity_factor=1.0, use_flash=True),
        "pallas2_flash": replace(base_cfg, compute_dtype="bfloat16", dispatch="pallas", capacity_factor=2.0, use_flash=True),
    }
    evals = {}
    for name, cfg in variants.items():
        den = make_den(cfg)
        t0 = time.time()
        with mp_ops.prenormalized_weights():
            fwd = jax.jit(lambda x, den=den: den(x, sigma, text)).lower(noise).compile()
        ms = timeit(fwd, noise) * 1e3
        evals[name] = ms
        log(f"denoiser eval {name}: {ms:.3f} ms (compile {time.time()-t0:.0f}s)")
        results[f"eval_{name}_ms"] = ms
    best = min(evals, key=evals.get)
    log(f"best variant: {best}")
    results["best_variant"] = best

    scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)
    for name in {best, "cap2"}:
        cfg = variants[name]
        den = make_den(cfg)
        t0 = time.time()
        with mp_ops.prenormalized_weights():
            sample = jax.jit(lambda n, den=den: edm_sample(den, n, text, scfg)).lower(noise).compile()
        log(f"sampler compile {name} {time.time()-t0:.0f}s")
        wall = timeit(sample, noise, n=3)
        ips = BATCH / wall
        log(f"sampler {name}: {wall:.4f} s -> {ips:.1f} img/s")
        results[f"sample_{name}_ips"] = ips


def main():
    log("device:", jax.devices()[0])
    micro_attention()
    model_variants()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log("DONE", json.dumps(results))


if __name__ == "__main__":
    main()
