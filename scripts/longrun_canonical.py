"""2,800-step canonical-skip flagship run — the reference-scale trajectory
(its checked-in run logs through step 2,770) with the EDM-paper skip, plus
sample grid and FID@5k. Complements artifacts/longrun_r2 (reference-skip
trajectory comparison) with the quality-side evidence: the canonical form
reaches a far lower denoising MSE at equal budget and actually samples.

Usage: python scripts/longrun_canonical.py [steps] [n_fid]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2800
N_FID = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
OUTDIR = "artifacts/longrun_canonical"
CKPT = os.path.abspath(f"{OUTDIR}/ckpt")


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    import jax

    from hdmoe_tpu.obs.fid import fid_from_checkpoint
    from hdmoe_tpu.obs.plotter import Plotter, make_router_probe
    from hdmoe_tpu.sampler.generate import sample_and_save
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.train_loop import training_hdmoe

    print("device:", jax.devices()[0], flush=True)
    model, optim, loss, mask, run = presets.latent_256_clip(total_steps=STEPS)
    model = replace(model, skip_mode="canonical")
    run = replace(run, save_dir=CKPT, save_interval=STEPS, total_steps=STEPS,
                  log_dir=f"{OUTDIR}/logs", telemetry_every=10)

    t0 = time.time()
    final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
    print(f"training done in {time.time()-t0:.0f}s: {final}", flush=True)

    out = fid_from_checkpoint(
        model, CKPT, dataset_name=run.dataset, data_root=run.data_root,
        resolution=run.data_img_res, n=N_FID, batch=64, num_steps=18,
        tower="random", vae="fake", text="fake", prompt=run.fixed_prompt)
    print(f"FID@{N_FID} (2800-step canonical): {out}", flush=True)
    with open(f"{OUTDIR}/RESULTS.json", "w") as f:
        json.dump({"steps": STEPS, "final": {k: float(v) for k, v in final.items()},
                   "fid": out}, f, indent=1)

    sample_and_save(model, checkpoint_dir=CKPT, out_dir=f"{OUTDIR}/samples",
                    batch_size=16, num_steps=18, vae_kind="fake", text_kind="fake",
                    prompt=run.fixed_prompt, seed=3)

    p = Plotter(f"{OUTDIR}/logs", run.run_name, out_dir=f"{OUTDIR}/analysis")
    outs = p.plot_all()
    print("dashboards:", [str(o) for o in outs], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
