"""Round-2 sample-quality artifact, canonical-skip edition.

Root-cause chain (see models/hdmoem.py:precond_apply and PERF.md):
the reference's non-canonical EDM skip D = c_skip*(c_in*x) + c_out*F makes
the sampling ODE diverge at low sigma (measured std 1.2 -> 158 over the
last Karras steps; the reference's own checked-in samples show the same
saturated divergence). skip_mode="canonical" restores the EDM-paper skip,
whose sigma->0 limit is stable even for an undertrained model.

This script: train the flagship config with skip_mode="canonical", then
  1. FID @ N trained vs untrained (random-conv tower, VAE-roundtripped
     real stream) — the metric must now separate them;
  2. a sample grid artifact;
  3. FID vs NFE sweep (reference to-do 6.3) + dashboard.

Usage: python scripts/fid_r2_canonical.py [steps] [n_fid]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
N_FID = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
OUTDIR = "artifacts/fid_r2_canonical"
CKPT = os.path.abspath(f"{OUTDIR}/ckpt_trained")
CKPT_INIT = os.path.abspath(f"{OUTDIR}/ckpt_init")


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.fid import fid_from_checkpoint
    from hdmoe_tpu.obs.plotter import Plotter
    from hdmoe_tpu.sampler.generate import sample_and_save
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_loop import training_hdmoe
    from hdmoe_tpu.train.train_step import init_train_state

    print("device:", jax.devices()[0], flush=True)
    model, optim, loss, mask, run = presets.latent_256_clip(total_steps=STEPS)
    model = replace(model, skip_mode="canonical")
    run = replace(run, save_dir=CKPT, save_interval=STEPS, total_steps=STEPS,
                  log_dir=f"{OUTDIR}/logs", telemetry_every=10)

    t0 = time.time()
    final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
    print(f"training done in {time.time()-t0:.0f}s: {final}", flush=True)

    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(7))
    CheckpointManager(CKPT_INIT).save(init_train_state(params0, OptimConfig()),
                                      jax.random.PRNGKey(7), mse=1.0)

    results = {"steps": STEPS, "n": N_FID, "skip_mode": "canonical"}
    for name, ckpt in (("trained", CKPT), ("untrained", CKPT_INIT)):
        t0 = time.time()
        out = fid_from_checkpoint(
            model, ckpt, dataset_name=run.dataset, data_root=run.data_root,
            resolution=run.data_img_res, n=N_FID, batch=64, num_steps=18,
            tower="random", vae="fake", text="fake", prompt=run.fixed_prompt)
        out["wall_s"] = round(time.time() - t0, 1)
        results[f"fid_{name}"] = out
        print(f"FID[{name}] = {out}", flush=True)

    with open(f"{OUTDIR}/RESULTS.json", "w") as f:
        json.dump(results, f, indent=1)

    # sample grid artifact
    sample_and_save(model, checkpoint_dir=CKPT, out_dir=f"{OUTDIR}/samples",
                    batch_size=16, num_steps=18, vae_kind="fake", text_kind="fake",
                    prompt=run.fixed_prompt, seed=3)
    print("samples written", flush=True)

    # FID vs NFE (reference to-do 6.3)
    jsonl = os.path.join(OUTDIR, f"{run.run_name}_fid.jsonl")
    with open(jsonl, "w") as f:
        for steps in (2, 3, 5, 10, 18):
            t0 = time.time()
            out = fid_from_checkpoint(
                model, CKPT, dataset_name=run.dataset, data_root=run.data_root,
                resolution=run.data_img_res, n=2000, batch=64, num_steps=steps,
                tower="random", vae="fake", text="fake", prompt=run.fixed_prompt)
            out["wall_s"] = round(time.time() - t0, 1)
            f.write(json.dumps(out) + "\n")
            f.flush()
            print(f"NFE {out['nfe']}: FID {out['fid']:.2f} ({out['wall_s']}s)", flush=True)
    p = Plotter(OUTDIR, run.run_name, out_dir=os.path.join(OUTDIR, "analysis"))
    print("rendered", p.plot_fid_vs_nfe(), flush=True)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
