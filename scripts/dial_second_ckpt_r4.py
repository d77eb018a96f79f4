"""Second-checkpoint dial validation (VERDICT r3 item 6).

The round-3 serving-dial result — priority-capacity sampling beating dense
on FID (cf2p 0.94 / cf1p 1.94 vs dense 1.43 at FID@5k, 50k-confirmed) —
rides a single canonical 2,800-step checkpoint, and compose_quality_r3
already showed dial gains can be checkpoint-dependent. This script trains
ONE more checkpoint with the recipe of record (b128, 1,248 steps, all
group LRs x2 — bigbatch_quality_r3's FID 0.514 winner) under a DIFFERENT
seed (init + data stream), then re-scores dense vs cf1-priority vs
cf2-priority with the exact serving_dial_r3 methodology (FID@5k,
random-conv tower, VAE-roundtripped real stream, value-fetch barriers).

Outcome table answers: does "priority beats dense" replicate on an
independently-trained checkpoint, or was it a coincidence of one run?

Usage: python scripts/dial_second_ckpt_r4.py [n_fid]
Writes artifacts/dial_second_ckpt_r4.json (resumable per-arm).
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FID = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
OUTDIR = "artifacts/dial_second_ckpt_r4"
OUT = f"{OUTDIR}/RESULTS.json"
SEED = 7  # independent init + data stream (canonical runs use seed 0)
BATCH = 32
NUM_STEPS = 18
PROMPT = "a photo of a flower"
TRAIN_BATCH, TRAIN_STEPS, LR_SCALE = 128, 1248, 2.0


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.fid import RandomConvFeatures, fid_evaluate
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.data import batch_iterator, make_dataset
    from hdmoe_tpu.train.train_loop import training_hdmoe
    from hdmoe_tpu.train.train_step import init_train_state

    print("device:", jax.devices()[0], flush=True)
    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    # ---- train the independent checkpoint (recipe of record, new seed) ----
    model, optim, loss, mask, run0 = presets.latent_256_clip(total_steps=TRAIN_STEPS)
    model = replace(model, skip_mode="canonical")
    optim = replace(
        optim,
        lr_vit=optim.lr_vit * LR_SCALE, lr_unet=optim.lr_unet * LR_SCALE,
        lr_attn=optim.lr_attn * LR_SCALE, lr_router=optim.lr_router * LR_SCALE,
        lr_other=optim.lr_other * LR_SCALE,
    )
    ckpt_dir = os.path.abspath(f"{OUTDIR}/ckpt_seed{SEED}")
    if "train" not in results:
        run = replace(run0, dataset="synthetic-device", steps_per_call=8,
                      telemetry_every=50, batch_size=TRAIN_BATCH,
                      save_dir=ckpt_dir, save_interval=TRAIN_STEPS,
                      total_steps=TRAIN_STEPS, seed=SEED,
                      log_dir=f"{OUTDIR}/logs", run_name=f"dial2_seed{SEED}")
        t0 = time.time()
        final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
        results["train"] = {
            "seed": SEED, "batch": TRAIN_BATCH, "steps": TRAIN_STEPS,
            "lr_scale": LR_SCALE, "wall_s": round(time.time() - t0, 1),
            "final_loss": float(final["loss"]),
            "final_mse": float(final["denoising"]),
        }
        print("[train]", results["train"], flush=True)
        save()

    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    from hdmoe_tpu.train.optim import OptimConfig

    cm = CheckpointManager(ckpt_dir)
    state, _, _ = cm.restore(init_train_state(params0, OptimConfig()),
                             jax.random.PRNGKey(0))
    params = state.params
    cm.close()

    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()

    def fast(cfg_kw):
        return replace(model, compute_dtype="bfloat16", use_flash=True, **cfg_kw)

    variants = {
        "bf16_flash_dense": fast({"dispatch": "dense"}),
        "bf16_flash_cf1_priority": fast(
            {"dispatch": "capacity", "capacity_factor": 1.0,
             "capacity_policy": "priority"}),
        "bf16_flash_cf2_priority": fast(
            {"dispatch": "capacity", "capacity_factor": 2.0,
             "capacity_policy": "priority"}),
    }

    for name, cfg in variants.items():
        if name in results:
            print(f"[{name}] already recorded, skipping", flush=True)
            continue
        t0 = time.time()
        engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=NUM_STEPS,
                               vae_kind="fake", text_kind="fake")
        print(f"[{name}] engine compiled in {time.time()-t0:.0f}s", flush=True)

        noise = jax.random.normal(
            jax.random.PRNGKey(1),
            (BATCH, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))
        text = engine.clip.encode_text([PROMPT] * BATCH)
        k = jax.random.PRNGKey(2)
        float(engine._sample(noise, text, k)[0, 0, 0, 0])
        walls = []
        for _ in range(3):
            t0 = time.time()
            float(engine._sample(noise, text, k)[0, 0, 0, 0])
            walls.append(time.time() - t0)
        wall = sorted(walls)[1]

        counter = iter(range(1 << 62))

        def sample_fn(n_req):
            return engine.sample([PROMPT] * n_req, seed=1000 + next(counter))

        def real_stream():
            for imgs in batch_iterator(ds, BATCH, seed=0):
                yield np.asarray(engine.vae.decode(engine.vae.encode(jnp.asarray(imgs))))

        t0 = time.time()
        fid = fid_evaluate(sample_fn, real_stream(), feature_fn, n=N_FID, batch=BATCH)
        results[name] = {
            "img_per_sec_chip": round(BATCH / wall, 1),
            "fid": round(float(fid), 4),
            "n": N_FID, "nfe": 2 * NUM_STEPS - 1,
            "tower": "random-conv",
            "tower_fingerprint": feature_fn.fingerprint(),
            "real_roundtrip": True,
        }
        print(f"[{name}] {results[name]} (fid wall {time.time()-t0:.0f}s)",
              flush=True)
        save()
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
