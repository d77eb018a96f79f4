"""Round-2 batch B TPU measurements.

1. text_guided_64 TRAIN STEP (seq-4096 fusion attention): dense attention vs
   flash with the fused Pallas backward — the VERDICT item-8 "measured
   train-step improvement" number.
2. Flagship sampler at batch 64 with the new fast config (flash + cf1.0):
   the attention HBM wall that made batch 64 lose in round 1 is gone;
   re-measure once (PERF.md names this the one justified retry).

Usage: python scripts/perf_round2b.py [outfile]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r2/round2b.json"
results = {}


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def train_step_text64():
    from hdmoe_tpu.train.loss import EDMLossConfig
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.presets import text_guided_64
    from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
    from hdmoe_tpu.train.train_step import TrainConfig, init_train_state, make_train_step
    from hdmoe_tpu.models import precond_init

    model, optim, loss, mask, run = text_guided_64()
    # batch 4: the DENSE variant at batch 16 needs (16,8,4096,4096) fp32
    # logits + backward residuals = 26.9 GB > 15.75 GB HBM (measured OOM) —
    # itself the flash-backward motivation; batch 4 lets both variants fit.
    b = 4
    umask = MaskGenerator(expert_attributes=tuple(mask["unet_attr"]), p_mean=-1.2, p_std=1.6)
    vmask = MaskGenerator(expert_attributes=tuple(mask["vit_attr"]), p_mean=-1.2, p_std=1.6)
    zeta = ZetaSchedule(total_steps=5000, max_zeta=2.0, min_zeta=0.01)

    latents = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 3)) * 0.5
    txt = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768))

    for name, cfg in (
        ("dense_attn", replace(model, use_flash=False)),
        ("flash_fused_bwd", model),
    ):
        t0 = time.time()
        params = jax.jit(lambda k, c=cfg: precond_init(k, c))(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        state = init_train_state(params, optim)
        step = make_train_step(cfg, loss, optim, TrainConfig(p_mean=-1.2, p_std=1.6),
                               umask, vmask, zeta)
        jit_step = jax.jit(step)
        compiled = jit_step.lower(state, latents, txt, jax.random.PRNGKey(3)).compile()
        log(f"{name}: compile {time.time()-t0:.0f}s")
        ms = timeit(lambda s=state: compiled(s, latents, txt, jax.random.PRNGKey(3)), n=10) * 1e3
        results[f"text64_train_step_{name}_ms"] = ms
        log(f"text64 train step {name}: {ms:.2f} ms (batch {b}, seq 4096 fusion attn)")


def sampler_batch64():
    import contextlib

    from hdmoe_tpu.models import default_model_config, precond_init, precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser
    from hdmoe_tpu.train.optim import project_mp_weights

    for batch in (64,):
        cfg = default_model_config(compute_dtype="bfloat16", dispatch="capacity",
                                   capacity_factor=1.0, use_flash=True)
        params = jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0))
        fparams = project_mp_weights(params)
        text = jax.random.normal(jax.random.PRNGKey(1), (batch, 77, cfg.text_emb_dim))
        noise = jax.random.normal(jax.random.PRNGKey(2), (batch, 32, 32, 4))

        def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
            return precond_apply(fparams, cfg, x, sigma, text_emb, m1, m2, zeta,
                                 transition_point=transition_point, softness=softness)

        den = make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)
        t0 = time.time()
        with mp_ops.prenormalized_weights():
            sample = jax.jit(lambda n: edm_sample(den, n, text, EDMSamplerConfig(num_steps=18))).lower(noise).compile()
        log(f"batch{batch} sampler compile {time.time()-t0:.0f}s")
        wall = timeit(sample, noise, n=3)
        ips = batch / wall
        results[f"sample_b{batch}_cap1_flash_ips"] = ips
        log(f"sampler batch {batch} (flash+cf1): {wall:.4f} s -> {ips:.1f} img/s")


def main():
    log("device:", jax.devices()[0])
    train_step_text64()
    sampler_batch64()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log("DONE", json.dumps(results))


if __name__ == "__main__":
    main()
