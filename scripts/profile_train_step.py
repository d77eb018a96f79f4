"""Profile the flagship TRAIN step (VERDICT item: the backward has never
seen a profiler — all round-2 xplane work was sampler-side).

Captures a jax.profiler trace around warm jitted train steps on the
flagship config of record (latent 32x32x4, 4+4 experts, batch 32), parses
the per-op breakdown with scripts/parse_xplane.py machinery, and estimates
MFU from XLA's FLOP count.

Usage: python scripts/profile_train_step.py [outdir]
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: skip HF retries
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTDIR = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r3_train"
BATCH = 32
N_STEPS = 10


def main():
    import jax
    import jax.numpy as jnp

    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.loss import EDMLossConfig
    from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
    from hdmoe_tpu.train.train_step import TrainConfig, init_train_state, make_train_step
    from hdmoe_tpu.models import precond_init

    os.makedirs(OUTDIR, exist_ok=True)
    print("device:", jax.devices()[0], flush=True)

    model, optim, loss, mask, run = presets.latent_256_clip(total_steps=1000)
    model = replace(model, skip_mode="canonical")
    umask = MaskGenerator(expert_attributes=tuple(mask["unet_attr"]), p_mean=mask["p_mean"],
                          p_std=mask["p_std"], noise_range=tuple(mask["unet_noise_range"]))
    vmask = MaskGenerator(expert_attributes=tuple(mask["vit_attr"]), p_mean=mask["p_mean"],
                          p_std=mask["p_std"], noise_range=tuple(mask["vit_noise_range"]))
    zeta = ZetaSchedule(total_steps=1000, max_zeta=2.0, min_zeta=0.01)
    tcfg = TrainConfig(p_mean=mask["p_mean"], p_std=mask["p_std"])

    params = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    state = init_train_state(params, optim)
    step_fn = jax.jit(make_train_step(model, loss, optim, tcfg, umask, vmask, zeta))

    latents = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 32, 32, 4)) * 0.5
    text = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 77, model.text_emb_dim))

    # warm up (compile)
    t0 = time.time()
    state, m, _ = step_fn(state, latents, text, jax.random.PRNGKey(3))
    float(m["loss"])  # value fetch (PERF.md timing-barrier caveat)
    print(f"compile+first step {time.time()-t0:.1f}s", flush=True)

    # warm wall
    t0 = time.time()
    for i in range(N_STEPS):
        state, m, _ = step_fn(state, latents, text, jax.random.fold_in(jax.random.PRNGKey(4), i))
    float(m["loss"])  # value fetch
    wall = (time.time() - t0) / N_STEPS
    print(f"train step wall {wall*1e3:.2f} ms -> {BATCH/wall:.1f} img/s compute-only", flush=True)

    # FLOP estimate from the compiled executable
    try:
        lowered = jax.jit(make_train_step(model, loss, optim, tcfg, umask, vmask, zeta)).lower(
            state, latents, text, jax.random.PRNGKey(5))
        cost = lowered.compile().cost_analysis()
        cost0 = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost0.get("flops", 0.0))
    except Exception as e:
        flops, cost0 = 0.0, {"error": str(e)}
    mfu = flops / wall / 197e12 if flops else None  # v5e bf16 peak 197 TF/s
    print(f"XLA flops/step {flops/1e9:.1f} GF, MFU(bf16 peak) {100*mfu:.1f}%" if flops
          else "no flop estimate", flush=True)

    # trace capture
    jax.profiler.start_trace(os.path.join(OUTDIR, "trace"))
    for i in range(N_STEPS):
        state, m, _ = step_fn(state, latents, text, jax.random.fold_in(jax.random.PRNGKey(6), i))
    float(m["loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    summary = {"step_ms": round(wall * 1e3, 2), "img_per_sec_compute": round(BATCH / wall, 1),
               "xla_flops_per_step": flops, "mfu_vs_197tf": round(mfu, 4) if mfu else None,
               "batch": BATCH, "n_steps": N_STEPS}
    with open(os.path.join(OUTDIR, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)

    # parse the xplane into a per-op table
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        import subprocess

        subprocess.run([sys.executable, "scripts/parse_xplane.py",
                        os.path.join(OUTDIR, "trace"), OUTDIR], check=False)
    except Exception as e:
        print("parse failed:", e, flush=True)
    print("DONE", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
