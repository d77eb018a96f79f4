"""FID-grade quality check for capacity-einsum TRAINING dispatch.

train_einsum_ab_r5.json measured dispatch="einsum", cf=2 at 30-50% faster
training steps with loss identical to 4 decimals — but cf2 drops ~0-1.6%
of routed samples per step (fcfs), and loss identity over 1200 steps is
necessary, not sufficient, for recipe-grade quality. This trains the full
recipe of record (b128, LRx2, 1248 steps, seed 7 — the dial_second_ckpt_r4
protocol) with the einsum-cf2 TRAINING step and scores dense-dispatch
FID@5k against the dense-trained anchor (0.2857).

Verdict rule: FID within ~1.15x of the anchor => the training default can
flip next round; worse => the refutation is recorded and the 30-50% win
stays opt-in.

Usage: python scripts/train_einsum_quality_r5.py [n_fid]
Writes artifacts/train_einsum_quality_r5.json.
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FID = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
os.environ.setdefault("HF_HUB_OFFLINE", "1")
OUTDIR = "artifacts/train_einsum_quality_r5"
OUT = f"{OUTDIR}/RESULTS.json"
SEED = 7
BATCH = 32
NUM_STEPS = 18
PROMPT = "a photo of a flower"
TRAIN_BATCH, TRAIN_STEPS, LR_SCALE = 128, 1248, 2.0


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.compilecache import enable_persistent_cache
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.fid import RandomConvFeatures, fid_evaluate
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.data import batch_iterator, make_dataset
    from hdmoe_tpu.train.train_loop import training_hdmoe
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    enable_persistent_cache()
    print("device:", jax.devices()[0], flush=True)
    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    model, optim, loss, mask, run0 = presets.latent_256_clip(total_steps=TRAIN_STEPS)
    # the ONLY deviation from dial_second_ckpt_r4's recipe: the training
    # step dispatches with capacity-einsum cf=2 (fcfs, the measured arm)
    model = replace(model, skip_mode="canonical", dispatch="einsum",
                    capacity_factor=2.0)
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
                      log_dir=f"{OUTDIR}/logs", run_name=f"einsumtrain_seed{SEED}")
        t0 = time.time()
        final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
        results["train"] = {
            "seed": SEED, "batch": TRAIN_BATCH, "steps": TRAIN_STEPS,
            "lr_scale": LR_SCALE, "dispatch": "einsum_cf2",
            "wall_s": round(time.time() - t0, 1),
            "final_loss": float(final["loss"]),
            "final_mse": float(final["denoising"]),
        }
        print("[train]", results["train"], flush=True)
        save()

    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    cm = CheckpointManager(ckpt_dir)
    state, _, _ = cm.restore(init_train_state(params0, OptimConfig()),
                             jax.random.PRNGKey(0))
    params = state.params
    cm.close()

    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()
    name = "einsum_trained_dense_fid"
    if name not in results:
        cfg = replace(model, compute_dtype="bfloat16", use_flash=True,
                      dispatch="dense")
        engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=NUM_STEPS,
                               vae_kind="fake", text_kind="fake")
        counter = iter(range(1 << 40))

        def sample_fn(n_req):
            return engine.sample([PROMPT] * n_req, seed=1000 + next(counter))

        def real_stream():
            for imgs in batch_iterator(ds, BATCH, seed=0):
                yield np.asarray(engine.vae.decode(engine.vae.encode(jnp.asarray(imgs))))

        t0 = time.time()
        fid = fid_evaluate(sample_fn, real_stream(), feature_fn, n=N_FID, batch=BATCH)
        results[name] = {
            "fid": round(float(fid), 4), "n": N_FID, "nfe": 2 * NUM_STEPS - 1,
            "tower_fingerprint": feature_fn.fingerprint(),
            "anchor_dense_trained_fid": 0.2857,
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"[{name}] {results[name]}", flush=True)
        save()
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
