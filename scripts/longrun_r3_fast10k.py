"""Round-3 capstone training run: 10,000 steps through the fast loop.

Exercises every round-3 training-path win at once, at 3.6x the canonical
step budget:

  - flash attention in the train step (+12%, artifacts/train_step_dtype_r3.json)
  - on-device data generation (zero H2D, artifacts/feed_throughput_r3_idle.json)
  - K=8 optimizer steps per dispatch (amortized tunnel gap)
  - device-side weight-stats reduction (no multi-second logger stalls)
  - EMA with a run-length-matched decay (0.9995 -> 2,000-step horizon;
    the 0.9999/2,800-step run showed horizon >> run length hurts)

Evaluates raw vs EMA weights at the end: MSE-vs-sigma + FID@5k + grids
(longrun_canonical methodology: random-conv tower, VAE-roundtripped real
stream). Canonical-skip. Reference anchor: Utils/training.py:114-197 (the
loop), README.md:8 (EMA TODO).

Usage: python scripts/longrun_r3_fast10k.py [steps] [n_fid]
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: skip HF retries
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_FID = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
OUTDIR = "artifacts/longrun_r3_fast10k"
CKPT = os.path.abspath(f"{OUTDIR}/ckpt")
BATCH = 32


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    import jax

    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.train_loop import training_hdmoe

    print("device:", jax.devices()[0], flush=True)
    model, optim, loss, mask, run = presets.latent_256_clip(total_steps=STEPS)
    model = replace(model, skip_mode="canonical")
    run = replace(run, dataset="synthetic-device", steps_per_call=8,
                  telemetry_every=50, save_dir=CKPT, save_interval=STEPS,
                  total_steps=STEPS, log_dir=f"{OUTDIR}/logs",
                  run_name="fast10k", ema_decay=0.9995,
                  # post-hoc EMA snapshots: sweep averaging lengths AFTER
                  # training (train/ema.py posthoc_ema)
                  ema_posthoc_every=500)

    t0 = time.time()
    final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
    train_wall = time.time() - t0
    print(f"training done in {train_wall:.0f}s "
          f"({STEPS * run.batch_size / train_wall:.1f} img/s full loop incl compile)",
          flush=True)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from longrun_r3_ema import eval_weights  # same methodology
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.data import make_dataset
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    ds = make_dataset("synthetic", resolution=run.data_img_res, seed=0)

    # one jitted flagship init serves all tree-structure needs below (each
    # re-init is a full device dispatch through the tunnel)
    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))

    def load(ckpt_dir):
        cm = CheckpointManager(ckpt_dir)
        state, _, _ = cm.restore(init_train_state(params0, OptimConfig()), jax.random.PRNGKey(0))
        cm.close()
        return state.params

    results = {"steps": STEPS, "train_wall_s": round(train_wall, 1),
               "full_loop_img_per_sec_incl_compile": round(STEPS * run.batch_size / train_wall, 1),
               "ema_decay": 0.9995,
               "final": {k: float(v) for k, v in final.items()}}
    for tag, ckpt_dir in (("raw", CKPT), ("ema", CKPT + "_ema")):
        results[tag] = eval_weights(tag, model, load(ckpt_dir), ds, outdir=OUTDIR, n_fid=N_FID)
        print(f"[{tag}] {results[tag]}", flush=True)
        with open(f"{OUTDIR}/RESULTS.json", "w") as f:
            json.dump(results, f, indent=1)

    # post-hoc EMA sweep: synthesize three averaging lengths from the
    # snapshots and score each (the whole point: pick sigma_rel AFTER
    # training; reference TODO 8)
    import numpy as np

    from hdmoe_tpu.train.ema import load_power_snapshots, posthoc_ema

    snaps = load_power_snapshots(CKPT + "_posthoc.npz", params0)
    for sr in (0.05, 0.10, 0.15):
        import jax.numpy as jnp

        tree = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float32),
            posthoc_ema(snaps, STEPS, sigma_rel=sr))
        tag = f"posthoc_sr{sr:g}"
        results[tag] = eval_weights(tag, model, tree, ds, outdir=OUTDIR, n_fid=N_FID)
        print(f"[{tag}] {results[tag]}", flush=True)
        with open(f"{OUTDIR}/RESULTS.json", "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
