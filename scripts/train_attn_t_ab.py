"""Train-step A/B: transposed attention pipeline vs standard.

The transposed pipeline (attn_layout "t", default) is a pure win for the
sampler forward (+14.7%, attn_t_ab_r3.json), but the training backward
reuses the standard-layout kernels via explicit transposes — so a train
step trades the forward's copy savings against new backward transposes.
This measures the flagship fp32+flash train step (the preset default)
both ways, same 1200-step K=8 wall methodology as train_step_dtype_r3.py.
If "t" regresses training, the right scoping is attn_layout("std") around
the train-loop trace. Writes artifacts/train_attn_t_ab.json.
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/train_attn_t_ab.json"
BATCH = 32
K = 8
N_DISPATCH = 150


def main():
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.ops.attention import attn_layout
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

    results = {"batch": BATCH, "k": K}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for layout in ("std", "t"):
        name = f"fp32_flash_{layout}"
        if name in results:
            continue
        params = jax.jit(lambda k: precond_init(k, base_model))(jax.random.PRNGKey(0))
        state = init_train_state(params, optim)
        step = make_train_step(base_model, loss, optim, tcfg, umask, vmask, zeta)

        lat_k = jax.random.normal(jax.random.PRNGKey(1), (K, BATCH, 32, 32, 4)) * 0.5
        text = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 77, base_model.text_emb_dim))

        t0 = time.time()
        with attn_layout(layout):
            multi = (jax.jit(make_train_multistep(step, K))
                     .lower(state, lat_k, text, jax.random.PRNGKey(3)).compile())
        state2, m, _ = multi(state, lat_k, text, jax.random.PRNGKey(3))
        float(m["loss"])
        compile_s = time.time() - t0

        t0 = time.time()
        st = state
        for i in range(N_DISPATCH):
            st, m, _ = multi(st, lat_k, text, jax.random.fold_in(jax.random.PRNGKey(4), i))
        loss_val = float(m["loss"])  # value-fetch barrier (PERF.md caveat)
        wall = (time.time() - t0) / (N_DISPATCH * K)
        results[name] = {
            "step_ms": round(wall * 1e3, 2),
            "img_per_sec": round(BATCH / wall, 1),
            "compile_s": round(compile_s, 1),
            "loss_final": round(loss_val, 4),
        }
        print(f"[{name}] {results[name]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
