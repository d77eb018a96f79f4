"""Training batch-knee sweep: does the sampler's batch-512 win transfer?

The sampler found a strong batch knee (183.8 -> 270.7 img/s from b32 ->
b512, artifacts/b128_validate_r3.json) because per-STEP fixed costs
(weight traffic, dispatch scheduling) amortize over a bigger batch. The
training number of record (588 img/s sustained, 96% of roofline) was
measured at batch 32 only — the roofline itself is a b32 roofline.
This sweeps the flagship fp32+flash train step (the preset default,
train_step_dtype_r3 methodology: K=8 device-side multi-step, long walls,
value-fetch barriers) over batch {32, 64, 128, 256, 512}, holding the
total *image* budget per arm constant so every wall is tunnel-robust.

Caveat recorded with the result: a bigger batch changes optimization
semantics (fewer optimizer steps per image); the knee is a throughput
fact, not automatically a time-to-quality fact.

Usage: python scripts/train_batch_knee_r3.py [out_json]
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/train_batch_knee_r3.json"
K = 8
IMAGE_BUDGET = 38_400  # = 150 dispatches * K8 * b32, the dtype-A/B wall


def main():
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
    from hdmoe_tpu.train.train_step import (
        TrainConfig, init_train_state, make_train_multistep, make_train_step)

    print("device:", jax.devices()[0], flush=True)
    base_model, optim, loss, mask, run = presets.latent_256_clip(total_steps=1000)
    base_model = replace(base_model, skip_mode="canonical", use_flash=True)
    umask = MaskGenerator(expert_attributes=tuple(mask["unet_attr"]), p_mean=mask["p_mean"],
                          p_std=mask["p_std"], noise_range=tuple(mask["unet_noise_range"]))
    vmask = MaskGenerator(expert_attributes=tuple(mask["vit_attr"]), p_mean=mask["p_mean"],
                          p_std=mask["p_std"], noise_range=tuple(mask["vit_noise_range"]))
    zeta = ZetaSchedule(total_steps=1000, max_zeta=2.0, min_zeta=0.01)
    tcfg = TrainConfig(p_mean=mask["p_mean"], p_std=mask["p_std"])

    results = {"k": K, "image_budget": IMAGE_BUDGET, "variant": "fp32_flash (preset default)"}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    arms = [("b%d" % b, b, {}) for b in (32, 64, 128, 256, 512)]
    # bf16 opt-in at the two largest batches: if the knee exists, this is
    # where the bf16 +11% (train_step_dtype_r3) compounds with it.
    arms += [("b256_bf16", 256, {"compute_dtype": "bfloat16"}),
             ("b512_bf16", 512, {"compute_dtype": "bfloat16"})]

    for name, batch, kw in arms:
        if name in results:
            continue
        n_dispatch = max(8, IMAGE_BUDGET // (K * batch))
        try:
            model = replace(base_model, **kw)
            params = jax.jit(lambda k, m=model: precond_init(k, m))(jax.random.PRNGKey(0))
            state = init_train_state(params, optim)
            step = make_train_step(model, loss, optim, tcfg, umask, vmask, zeta)
            multi = jax.jit(make_train_multistep(step, K))

            lat_k = jax.random.normal(jax.random.PRNGKey(1), (K, batch, 32, 32, 4)) * 0.5
            text = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, base_model.text_emb_dim))

            t0 = time.time()
            state, m, _ = multi(state, lat_k, text, jax.random.PRNGKey(3))
            float(m["loss"])  # value-fetch barrier (PERF.md tunnel caveat)
            compile_s = time.time() - t0

            t0 = time.time()
            for i in range(n_dispatch):
                state, m, _ = multi(state, lat_k, text,
                                    jax.random.fold_in(jax.random.PRNGKey(4), i))
            loss_val = float(m["loss"])
            wall = (time.time() - t0) / (n_dispatch * K)
            results[name] = {
                "batch": batch,
                "step_ms": round(wall * 1e3, 2),
                "img_per_sec": round(batch / wall, 1),
                "dispatches": n_dispatch,
                "compile_s": round(compile_s, 1),
                "loss_final": round(loss_val, 4),
            }
        except Exception as e:  # OOM at large batch is a finding, not a crash
            results[name] = {"batch": batch, "error": f"{type(e).__name__}: {e}"[:400]}
        print(f"[{name}] {results[name]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
