"""FID vs NFE sweep from a trained checkpoint — realizes the reference's
to-do item 6.3 ("FID score VS Number of function -> (denoiser) evaluations",
README.md:13; never implemented in graphs/plotter.py).

For each Heun step count (NFE = 2*steps - 1) the streaming FID harness
(obs/fid.py) samples N images through the AOT engine and scores them
against the training distribution. Results go to
<out>/<run>_fid.jsonl and the curve renders via Plotter.plot_fid_vs_nfe.

Usage: python scripts/fid_vs_nfe.py <checkpoint_dir> [n_per_point]
       (default checkpoint: artifacts/fid_r2/ckpt_trained from fid_r2.py)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/fid_r2/ckpt_trained"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
OUTDIR = "artifacts/fid_r2"
# both solvers at comparable NFE grids (heun NFE = 2*steps-1; dpm = steps)
SWEEP = (
    ("heun", (2, 3, 5, 10, 18)),       # NFE 3, 5, 9, 19, 35
    ("dpmpp2m", (3, 5, 9, 19, 35)),    # NFE 3, 5, 9, 19, 35
)


def main():
    import jax

    from hdmoe_tpu.obs.fid import fid_from_checkpoint
    from hdmoe_tpu.obs.plotter import Plotter
    from hdmoe_tpu.train import presets

    print("device:", jax.devices()[0], flush=True)
    model, _, _, _, run = presets.latent_256_clip()
    os.makedirs(OUTDIR, exist_ok=True)
    jsonl = os.path.join(OUTDIR, f"{run.run_name}_fid.jsonl")
    with open(jsonl, "w") as f:
        for solver, steps_grid in SWEEP:
            for steps in steps_grid:
                t0 = time.time()
                out = fid_from_checkpoint(
                    model, os.path.abspath(CKPT), dataset_name=run.dataset,
                    data_root=run.data_root, resolution=run.data_img_res,
                    n=N, batch=64, num_steps=steps, tower="auto",
                    vae="fake", text="fake", prompt=run.fixed_prompt,
                    solver=solver)
                out["wall_s"] = round(time.time() - t0, 1)
                f.write(json.dumps(out) + "\n")
                f.flush()
                print(f"{solver} NFE {out['nfe']}: FID {out['fid']:.2f} "
                      f"({out['wall_s']}s)", flush=True)

    p = Plotter(OUTDIR, run.run_name, out_dir=os.path.join(OUTDIR, "analysis"))
    png = p.plot_fid_vs_nfe()
    print("rendered", png, flush=True)


if __name__ == "__main__":
    main()
