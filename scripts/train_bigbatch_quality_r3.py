"""Large-batch training quality at matched WALL CLOCK (follow-up to
train_batch_knee_r3).

The knee sweep proved b128 fp32+flash moves per-image throughput 673 ->
1210 img/s, with the recorded caveat "a throughput fact, not automatically
a time-to-quality fact". This settles the quality half: the canonical
recipe (b32, 2,800 steps, ~133 s of device time) vs b128 arms on the same
device-time budget, all scored with the longrun methodology (MSE-vs-sigma
+ FID@5k, random-conv tower).

Arms (identical canonical-skip flagship config, on-device feed, K=8):
  b32_2800   — the canonical recipe re-run in THIS session (fresh control;
               augment_ab_r3 "off" scored 1.424 on an earlier session)
  b128_mw    — b128, 1,248 steps ~= the same device wall, reference LRs
  b128_mw_lr2— b128, 1,248 steps, all group LRs x2 (sqrt scaling rule for
               4x batch — fixed-LR large-batch is known to undertrain)
  b128_2800  — b128, matched STEPS (4x images, ~2.2x wall): is more data
               per step worth anything at this model scale?

Usage: python scripts/train_bigbatch_quality_r3.py [n_fid]
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FID = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
OUTDIR = "artifacts/bigbatch_quality_r3"


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    import jax

    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.data import make_dataset
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_loop import training_hdmoe
    from hdmoe_tpu.train.train_step import init_train_state
    from hdmoe_tpu.models import precond_init

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from longrun_r3_ema import eval_weights

    print("device:", jax.devices()[0], flush=True)

    # (tag, batch, steps, lr_scale)
    arms = [
        ("b32_2800", 32, 2800, 1.0),
        ("b128_mw", 128, 1248, 1.0),
        ("b128_mw_lr2", 128, 1248, 2.0),
        ("b128_2800", 128, 2800, 1.0),
    ]

    ds = make_dataset("synthetic", resolution=256, seed=0)
    results = {"n_fid": N_FID}
    res_path = f"{OUTDIR}/RESULTS.json"
    if os.path.exists(res_path):
        results.update(json.load(open(res_path)))

    for tag, batch, steps, lr_scale in arms:
        if tag in results:
            print(f"[{tag}] already recorded, skipping", flush=True)
            continue
        model, optim, loss, mask, run0 = presets.latent_256_clip(total_steps=steps)
        model = replace(model, skip_mode="canonical")
        if lr_scale != 1.0:
            optim = replace(
                optim,
                lr_vit=optim.lr_vit * lr_scale, lr_unet=optim.lr_unet * lr_scale,
                lr_attn=optim.lr_attn * lr_scale, lr_router=optim.lr_router * lr_scale,
                lr_other=optim.lr_other * lr_scale,
            )
        ckpt = os.path.abspath(f"{OUTDIR}/ckpt_{tag}")
        run = replace(run0, dataset="synthetic-device", steps_per_call=8,
                      telemetry_every=50, batch_size=batch, save_dir=ckpt,
                      save_interval=steps, total_steps=steps,
                      log_dir=f"{OUTDIR}/logs", run_name=f"bb_{tag}")
        t0 = time.time()
        final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
        wall = time.time() - t0
        print(f"[{tag}] trained {steps} steps (b{batch}) in {wall:.0f}s", flush=True)

        params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
        cm = CheckpointManager(ckpt)
        state, _, _ = cm.restore(init_train_state(params0, optim),
                                 jax.random.PRNGKey(0))
        cm.close()
        row = eval_weights(tag, model, state.params, ds, outdir=OUTDIR, n_fid=N_FID)
        row.update(batch=batch, steps=steps, lr_scale=lr_scale,
                   images_seen=batch * steps,
                   train_wall_s=round(wall, 1),
                   final_loss=float(final["loss"]),
                   final_mse=float(final["denoising"]))
        results[tag] = row
        print(f"[{tag}] {row}", flush=True)
        with open(res_path, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
