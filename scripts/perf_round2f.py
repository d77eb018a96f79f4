"""Round-2f: text_guided_64 training throughput at batches the dense
attention cannot run.

Dense seq-4096 attention OOMs at batch 16 (26.9 GB of logits + residuals >
15.75 GB HBM); flash + the single-pass fused backward fits. This measures
the flash train step at batch 8/16 -> samples/s, the throughput the memory
win buys (at batch 4 flash is 41.2 ms vs dense 36.2, round2e.json).

Usage: python scripts/perf_round2f.py [outfile]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r2/round2f.json"
results = {}


def log(*a):
    print(*a, flush=True)


def main():
    from hdmoe_tpu.train.presets import text_guided_64
    from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
    from hdmoe_tpu.train.train_step import TrainConfig, init_train_state, make_train_step
    from hdmoe_tpu.models import precond_init

    log("device:", jax.devices()[0])
    model, optim, loss, mask, run = text_guided_64()
    umask = MaskGenerator(expert_attributes=tuple(mask["unet_attr"]), p_mean=-1.2, p_std=1.6)
    vmask = MaskGenerator(expert_attributes=tuple(mask["vit_attr"]), p_mean=-1.2, p_std=1.6)
    zeta = ZetaSchedule(total_steps=5000, max_zeta=2.0, min_zeta=0.01)

    params = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    state = init_train_state(params, optim)
    step = make_train_step(model, loss, optim, TrainConfig(p_mean=-1.2, p_std=1.6),
                           umask, vmask, zeta)
    jit_step = jax.jit(step)

    for b in (8, 16):
        latents = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 3)) * 0.5
        txt = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768))
        t0 = time.time()
        compiled = jit_step.lower(state, latents, txt, jax.random.PRNGKey(3)).compile()
        log(f"b{b}: compile {time.time()-t0:.0f}s")
        compiled(state, latents, txt, jax.random.PRNGKey(3))
        jax.block_until_ready(compiled(state, latents, txt, jax.random.PRNGKey(3))[1]["loss"])
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            r = compiled(state, latents, txt, jax.random.PRNGKey(3))
        jax.block_until_ready(r[1]["loss"])
        ms = (time.perf_counter() - t0) / n * 1e3
        results[f"text64_flash_train_b{b}_ms"] = ms
        results[f"text64_flash_train_b{b}_samples_s"] = b / ms * 1e3
        log(f"flash train step b={b}: {ms:.2f} ms -> {b/ms*1e3:.1f} samples/s")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log("DONE", json.dumps(results))


if __name__ == "__main__":
    main()
