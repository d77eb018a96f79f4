"""Round-3 acted-on finding from the train-step profile: dense fp32
attention runs at 1.2-2 TF/s (HBM-bound) and is ~28% of the on-device step
(artifacts/profile_r3_train). The sampler fixed this in round 2 with the
flash kernel + bf16; the training preset never adopted either.

A/B the flagship train step over {fp32, bf16} x {dense, flash} using the
device-side K=8 multi-step loop (one dispatch per 8 optimizer steps) so the
axon tunnel's per-dispatch gap — measured at ~90 ms/step this session —
cannot pollute the numbers.

Usage: python scripts/train_step_dtype_r3.py [out_json]
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: skip HF retries
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/train_step_dtype_r3.json"
BATCH = 32
K = 8
# 1200 optimizer steps timed (first dispatch excluded): 30-60+ s walls.
# The first attempt used 48 steps (~1.2 s walls) and produced numbers off
# by 2x from the feed sweep's sustained rates — tunnel weather dominates
# sub-10 s walls (see PERF.md micro-benchmark caveat).
N_DISPATCH = 150


def main():
    import jax
    import jax.numpy as jnp

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
    from hdmoe_tpu.train.train_step import (
        TrainConfig, init_train_state, make_train_multistep, make_train_step)

    print("device:", jax.devices()[0], flush=True)
    base_model, optim, loss, mask, run = presets.latent_256_clip(total_steps=1000)
    base_model = replace(base_model, skip_mode="canonical")
    umask = MaskGenerator(expert_attributes=tuple(mask["unet_attr"]), p_mean=mask["p_mean"],
                          p_std=mask["p_std"], noise_range=tuple(mask["unet_noise_range"]))
    vmask = MaskGenerator(expert_attributes=tuple(mask["vit_attr"]), p_mean=mask["p_mean"],
                          p_std=mask["p_std"], noise_range=tuple(mask["vit_noise_range"]))
    zeta = ZetaSchedule(total_steps=1000, max_zeta=2.0, min_zeta=0.01)
    tcfg = TrainConfig(p_mean=mask["p_mean"], p_std=mask["p_std"])

    variants = {
        "fp32_dense": {},
        "fp32_flash": {"use_flash": True},
        "bf16_dense": {"compute_dtype": "bfloat16"},
        "bf16_flash": {"compute_dtype": "bfloat16", "use_flash": True},
    }

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for name, kw in variants.items():
        if name in results:
            continue
        model = replace(base_model, **kw)
        params = jax.jit(lambda k, m=model: precond_init(k, m))(jax.random.PRNGKey(0))
        state = init_train_state(params, optim)
        step = make_train_step(model, loss, optim, tcfg, umask, vmask, zeta)
        multi = jax.jit(make_train_multistep(step, K))

        lat_k = jax.random.normal(jax.random.PRNGKey(1), (K, BATCH, 32, 32, 4)) * 0.5
        text = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 77, base_model.text_emb_dim))

        # NB: jax.block_until_ready on a tunnel-remote array does NOT drain
        # the dispatch queue here (measured: it "timed" the flagship step at
        # 6.8 ms = an impossible 97 TF/s fp32). float() forces the value
        # across the wire and is the only trustworthy completion barrier.
        t0 = time.time()
        state, m, _ = multi(state, lat_k, text, jax.random.PRNGKey(3))
        float(m["loss"])
        compile_s = time.time() - t0

        t0 = time.time()
        for i in range(N_DISPATCH):
            state, m, _ = multi(state, lat_k, text, jax.random.fold_in(jax.random.PRNGKey(4), i))
        loss_val = float(m["loss"])  # D2H barrier: depends on every step
        wall = (time.time() - t0) / (N_DISPATCH * K)
        results[name] = {
            "step_ms": round(wall * 1e3, 2),
            "img_per_sec": round(BATCH / wall, 1),
            "k_per_dispatch": K,
            "steps_timed": N_DISPATCH * K,
            "compile_s": round(compile_s, 1),
            "loss_final": round(loss_val, 4),
        }
        print(f"[{name}] {results[name]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
