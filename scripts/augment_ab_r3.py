"""Augmentation A/B at matched step budget (reference TODO 3.1: "search for
the most effective pipeline first").

Two fast-loop training runs of the flagship config, identical in everything
(canonical skip, on-device feed, K=8, seed) except RunConfig.augment:

  off     — control
  photo   — hflip 0.5 + translate 0.125 (the conservative default recipe)

Each run is scored with the longrun methodology (MSE-vs-sigma + FID@5k,
random-conv tower, VAE-roundtripped real stream). The synthetic-flowers
stream is procedurally varied already, so this measures the *pipeline cost/
benefit at matched steps* honestly — the expected effect is small; what
matters is the end-to-end evidence that augmentation trains and where the
quality moves. Writes artifacts/augment_ab_r3/RESULTS.json.

Usage: python scripts/augment_ab_r3.py [steps] [n_fid]
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2800
N_FID = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
OUTDIR = "artifacts/augment_ab_r3"


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    import jax

    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.augment import AugmentConfig
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
    model, optim, loss, mask, run0 = presets.latent_256_clip(total_steps=STEPS)
    model = replace(model, skip_mode="canonical")
    arms = {
        "off": None,
        "photo": AugmentConfig(hflip=0.5, translate=0.125),
    }
    ds = make_dataset("synthetic", resolution=run0.data_img_res, seed=0)
    results = {"steps": STEPS, "n_fid": N_FID}
    res_path = f"{OUTDIR}/RESULTS.json"
    if os.path.exists(res_path):
        results.update(json.load(open(res_path)))
    for tag, aug in arms.items():
        if tag in results:
            print(f"[{tag}] already recorded, skipping", flush=True)
            continue
        ckpt = os.path.abspath(f"{OUTDIR}/ckpt_{tag}")
        run = replace(run0, dataset="synthetic-device", steps_per_call=8,
                      telemetry_every=50, save_dir=ckpt, save_interval=STEPS,
                      total_steps=STEPS, log_dir=f"{OUTDIR}/logs",
                      run_name=f"aug_{tag}", augment=aug)
        t0 = time.time()
        final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
        wall = time.time() - t0
        print(f"[{tag}] trained {STEPS} steps in {wall:.0f}s", flush=True)

        params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
        cm = CheckpointManager(ckpt)
        state, _, _ = cm.restore(init_train_state(params0, OptimConfig()),
                                 jax.random.PRNGKey(0))
        cm.close()
        row = eval_weights(tag, model, state.params, ds, outdir=OUTDIR, n_fid=N_FID)
        row["train_wall_s"] = round(wall, 1)
        row["final_loss"] = float(final["loss"])
        row["final_mse"] = float(final["denoising"])
        results[tag] = row
        print(f"[{tag}] {row}", flush=True)
        with open(res_path, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
