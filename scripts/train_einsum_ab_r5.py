"""Train-step dispatch A/B: dense vs capacity(gather) vs capacity(einsum)
(VERDICT r4 item 6).

dispatch="einsum" (GShard one-hot MXU token movement) won +9.6% on the b512
sampler (artifacts/einsum_dispatch_ab_r4.json) and was adopted for bench +
serve, but the TRAINING default stayed "dense" with no measurement. This
runs the train_step_dtype_r3 protocol (device-side K=8 multi-step, 1200
optimizer steps timed, float() barrier) over the dispatch axis at the
canonical b32 and the bigbatch-recipe b128.

Notes on semantics: training batches draw per-sample sigmas, so router load
is mixed and capacity cf=2.0 (the config default) rarely drops; still,
capacity dispatch (either movement) changes gradients vs dense whenever a
drop occurs — this script records loss_final for a same-seed sanity check,
not a quality claim. A throughput win here would motivate the bigbatch
quality protocol before changing the training default.

Usage: python scripts/train_einsum_ab_r5.py [out_json]
Writes artifacts/train_einsum_ab_r5.json (incremental per-arm).
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/train_einsum_ab_r5.json"
K = 8
N_DISPATCH = 150  # 1200 steps timed


def main():
    import jax

    from hdmoe_tpu.compilecache import enable_persistent_cache
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
    from hdmoe_tpu.train.train_step import (
        TrainConfig, init_train_state, make_train_multistep, make_train_step)

    enable_persistent_cache()
    print("device:", jax.devices()[0], flush=True)
    base_model, optim, loss, mask, run = presets.latent_256_clip(total_steps=1000)
    base_model = replace(base_model, skip_mode="canonical")
    umask = MaskGenerator(expert_attributes=tuple(mask["unet_attr"]), p_mean=mask["p_mean"],
                          p_std=mask["p_std"], noise_range=tuple(mask["unet_noise_range"]))
    vmask = MaskGenerator(expert_attributes=tuple(mask["vit_attr"]), p_mean=mask["p_mean"],
                          p_std=mask["p_std"], noise_range=tuple(mask["vit_noise_range"]))
    zeta = ZetaSchedule(total_steps=1000, max_zeta=2.0, min_zeta=0.01)
    tcfg = TrainConfig(p_mean=mask["p_mean"], p_std=mask["p_std"])

    # bf16+flash is the measured-fastest precision arm
    # (artifacts/train_step_dtype_r3.json); A/B the dispatch axis on top of
    # it, plus the preset-default fp32+flash for the default decision.
    arms = []
    for b in (32, 128):
        for nm, kw in (
            ("dense", {"dispatch": "dense"}),
            ("cap_gather_cf2", {"dispatch": "capacity", "capacity_factor": 2.0}),
            ("cap_einsum_cf2", {"dispatch": "einsum", "capacity_factor": 2.0}),
        ):
            arms.append((f"bf16_flash_{nm}_b{b}", b,
                         dict(kw, compute_dtype="bfloat16", use_flash=True)))
    arms.append(("fp32_flash_dense_b32", 32, {"dispatch": "dense", "use_flash": True}))
    arms.append(("fp32_flash_cap_einsum_cf2_b32", 32,
                 {"dispatch": "einsum", "capacity_factor": 2.0, "use_flash": True}))

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for name, batch, kw in arms:
        if name in results:
            print(f"[{name}] cached", flush=True)
            continue
        model = replace(base_model, **kw)
        params = jax.jit(lambda k, m=model: precond_init(k, m))(jax.random.PRNGKey(0))
        state = init_train_state(params, optim)
        step = make_train_step(model, loss, optim, tcfg, umask, vmask, zeta)
        multi = jax.jit(make_train_multistep(step, K))

        lat_k = jax.random.normal(jax.random.PRNGKey(1), (K, batch, 32, 32, 4)) * 0.5
        text = jax.random.normal(jax.random.PRNGKey(2), (batch, 77, base_model.text_emb_dim))

        t0 = time.time()
        state, m, _ = multi(state, lat_k, text, jax.random.PRNGKey(3))
        float(m["loss"])  # tunnel-safe barrier (block_until_ready lies here)
        compile_s = time.time() - t0

        t0 = time.time()
        for i in range(N_DISPATCH):
            state, m, _ = multi(state, lat_k, text,
                                jax.random.fold_in(jax.random.PRNGKey(4), i))
        loss_val = float(m["loss"])
        wall = (time.time() - t0) / (N_DISPATCH * K)
        results[name] = {
            "step_ms": round(wall * 1e3, 2),
            "img_per_sec": round(batch / wall, 1),
            "batch": batch, "k_per_dispatch": K,
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
