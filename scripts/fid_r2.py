"""Round-2 FID artifact: train the flagship config with checkpointing, then
run the streaming FID harness (obs/fid.py) end-to-end on the real chip.

Produces artifacts/fid_r2/RESULTS.json with:
  - fid_trained:   FID @ N between the trained checkpoint's samples and the
                   training distribution (random-conv tower; CLIP weights are
                   unavailable in this zero-egress env — obs/fid.py gates the
                   CLIP tower behind weight availability)
  - fid_untrained: same harness on a random-init checkpoint (contrast — the
                   metric must separate trained from untrained)

The reference has no FID machinery at all (BASELINE.md: "published": {});
this demonstrates the BASELINE "FID parity @ 50k" harness actually running,
at a CI-sized N.

Usage: python scripts/fid_r2.py [steps] [n_fid]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
N_FID = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
OUTDIR = "artifacts/fid_r2"
CKPT = os.path.abspath(f"{OUTDIR}/ckpt_trained")
CKPT_INIT = os.path.abspath(f"{OUTDIR}/ckpt_init")


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    from dataclasses import replace

    import jax

    from hdmoe_tpu.obs.fid import fid_from_checkpoint
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.train_loop import training_hdmoe

    print("device:", jax.devices()[0], flush=True)
    model, optim, loss, mask, run = presets.latent_256_clip(total_steps=STEPS)
    run = replace(run, save_dir=CKPT, save_interval=STEPS, total_steps=STEPS,
                  log_dir=f"{OUTDIR}/logs", telemetry_every=10)

    t0 = time.time()
    final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
    print(f"training done in {time.time()-t0:.0f}s: {final}", flush=True)

    # random-init checkpoint for the contrast number
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(7))
    CheckpointManager(CKPT_INIT).save(init_train_state(params0, OptimConfig()),
                                      jax.random.PRNGKey(7), mse=1.0)

    results = {"steps": STEPS, "n": N_FID}
    for name, ckpt in (("trained", CKPT), ("untrained", CKPT_INIT)):
        t0 = time.time()
        out = fid_from_checkpoint(
            model, ckpt, dataset_name=run.dataset, data_root=run.data_root,
            resolution=run.data_img_res, n=N_FID, batch=64, num_steps=18,
            tower="auto", vae="fake", text="fake", prompt=run.fixed_prompt)
        out["wall_s"] = round(time.time() - t0, 1)
        results[f"fid_{name}"] = out
        print(f"FID[{name}] = {out}", flush=True)

    with open(f"{OUTDIR}/RESULTS.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
