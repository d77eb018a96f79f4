"""Compose the round-3 quality wins: augment-trained weights + priority dial.

Two independent round-3 results each beat the canonical FID@5k in isolation:
photo augmentation at matched training steps (1.258 vs 1.424 control,
artifacts/augment_ab_r3) and cf=2.0 priority-capacity sampling (0.94 vs
1.43 dense, artifacts/serving_dial_r3.json). This scores their composition
— the augment-trained 2,800-step checkpoint sampled through the
cf2-priority dial (Heun-18) and through the dpm20+cf2p sweet spot — with
the methodology of scripts/dpm_eval_r3.py (FID@5k, random-conv tower,
VAE-roundtripped real stream, value-fetch timing barriers).

Usage: python scripts/compose_quality_r3.py
Writes artifacts/compose_quality_r3.json (resumable; rows skipped if present).
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/compose_quality_r3.json"
CKPT = os.path.abspath("artifacts/augment_ab_r3/ckpt_photo")
BATCH = 32
N_FID = 5000
PROMPT = "a photo of a flower"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.fid import RandomConvFeatures, fid_evaluate
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.data import batch_iterator, make_dataset
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.presets import latent_256_clip
    from hdmoe_tpu.train.train_step import init_train_state

    if not os.path.isdir(CKPT):
        sys.exit(f"augment A/B checkpoint not on disk: {CKPT} "
                 f"(gitignored; rerun scripts/augment_ab_r3.py)")
    print("device:", jax.devices()[0], flush=True)
    model, _, _, _, _ = latent_256_clip()
    model = replace(model, skip_mode="canonical")

    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(CKPT)
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()),
                               jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()

    cf2p = replace(model, compute_dtype="bfloat16", use_flash=True,
                   dispatch="capacity", capacity_factor=2.0,
                   capacity_policy="priority")
    variants = [
        ("photo_cf2p_heun18", cf2p, "heun", 18),
        ("photo_cf2p_dpm20", cf2p, "dpmpp2m", 20),
    ]

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for name, cfg, solver, num_steps in variants:
        if name in results:
            print(f"[{name}] already recorded; skipping", flush=True)
            continue
        t0 = time.time()
        engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=num_steps,
                               vae_kind="fake", text_kind="fake", solver=solver)
        print(f"[{name}] engine compiled in {time.time()-t0:.0f}s "
              f"(nfe={engine.nfe})", flush=True)

        counter = iter(range(1 << 62))

        def sample_fn(n_req):
            return engine.sample([PROMPT] * n_req, seed=1000 + next(counter))

        def real_stream():
            for imgs in batch_iterator(ds, BATCH, seed=0):
                yield np.asarray(engine.vae.decode(engine.vae.encode(jnp.asarray(imgs))))

        t0 = time.time()
        fid = fid_evaluate(sample_fn, real_stream(), feature_fn, n=N_FID, batch=BATCH)
        results[name] = {
            "fid": round(float(fid), 4),
            "n": N_FID,
            "solver": solver,
            "num_steps": num_steps,
            "nfe": engine.nfe,
            "checkpoint": "augment_ab_r3/ckpt_photo (2,800 steps, photo augmentation)",
            "tower": "random-conv",
            "real_roundtrip": True,
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"[{name}] FID@{N_FID} {fid:.3f} ({time.time()-t0:.0f}s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
