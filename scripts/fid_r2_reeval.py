"""Re-evaluate FID from the fid_r2.py checkpoints with the roundtripped
real stream (obs/fid.py real_roundtrip): the first evaluation scored raw
synthetic images against FakeVAE-decoded samples, so the VAE's 8x8 block
structure dominated both trained (27.67) and untrained (27.85) scores.
Against VAE reconstructions the metric measures the MODEL.

Usage: python scripts/fid_r2_reeval.py [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
OUTDIR = "artifacts/fid_r2"


def main():
    from hdmoe_tpu.obs.fid import fid_from_checkpoint
    from hdmoe_tpu.train import presets

    import jax

    print("device:", jax.devices()[0], flush=True)
    model, _, _, _, run = presets.latent_256_clip()
    results = {"n": N, "real_roundtrip": True}
    for name in ("trained", "untrained"):
        ckpt = os.path.abspath(f"{OUTDIR}/ckpt_{'trained' if name == 'trained' else 'init'}")
        t0 = time.time()
        out = fid_from_checkpoint(
            model, ckpt, dataset_name=run.dataset, data_root=run.data_root,
            resolution=run.data_img_res, n=N, batch=64, num_steps=18,
            tower="random", vae="fake", text="fake", prompt=run.fixed_prompt)
        out["wall_s"] = round(time.time() - t0, 1)
        results[f"fid_{name}"] = out
        print(f"FID[{name}] = {out}", flush=True)

    with open(f"{OUTDIR}/RESULTS.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
