"""Round-3 EMA quality evidence (VERDICT item 6).

EMA exists for exactly one reason — better samples — and round 2 never
checked it. This script retrains the 2,800-step canonical-skip flagship run
WITH ema_decay=0.9999 (the round-2 run predates the knob's use), then
evaluates raw vs EMA weights on the same checkpoint budget:

  - denoising MSE on a fixed eval batch across sigma in [0.05, 5]
  - FID@5k (random-conv tower, VAE-roundtripped synthetic real stream —
    the longrun_canonical methodology)
  - sample grids from both

Reference anchor: the reference README lists post-hoc EMA as its open TODO
(README.md:8); train/ema.py implements tracking, train_loop.py saves the
EMA checkpoint to <save_dir>_ema.

Usage: python scripts/longrun_r3_ema.py [steps] [n_fid] [ema_decay]

The first run (decay 0.9999, artifacts/longrun_r3_ema) measured EMA FID
2.61 vs raw 1.42: a 0.9999 decay has a 1/(1-d) = 10,000-step averaging
horizon, so over a 2,800-step run the EMA is dominated by early-training
weights. Pass a run-length-matched decay (e.g. 0.999 -> 1,000-step horizon)
for the apples-to-apples quality datapoint (artifacts/longrun_r3_ema999).
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: skip HF retries
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2800
N_FID = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
EMA_DECAY = float(sys.argv[3]) if len(sys.argv) > 3 else 0.9999
OUTDIR = "artifacts/longrun_r3_ema" + (
    "" if EMA_DECAY == 0.9999 else str(EMA_DECAY).split(".")[1])
CKPT = os.path.abspath(f"{OUTDIR}/ckpt")
BATCH = 32
PROMPT = "a photo of a flower"


def eval_weights(tag, cfg, params, ds, outdir=None, n_fid=None):
    """MSE-vs-sigma + FID@5k + sample grid for one weight set.

    Shared with scripts/longrun_r3_fast10k.py (same methodology, different
    run directory) via the ``outdir``/``n_fid`` overrides."""
    outdir = outdir or OUTDIR
    n_fid = n_fid or N_FID
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.obs.fid import RandomConvFeatures, fid_evaluate
    from hdmoe_tpu.sampler.generate import save_image_grid
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train.data import batch_iterator

    engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=18,
                           vae_kind="fake", text_kind="fake")

    # denoise MSE on a fixed batch of VAE latents at several sigmas
    real = next(batch_iterator(ds, BATCH, seed=123, shuffle=False))
    lat = engine.vae.encode(jnp.asarray(real))
    from hdmoe_tpu.models.hdmoem import precond_apply
    from hdmoe_tpu.ops import mp as mp_ops

    mses = {}
    with mp_ops.prenormalized_weights():
        fwd = jax.jit(lambda x, s: precond_apply(
            engine.params, cfg, x, s, None, None, None, 0.0,
            transition_point=-1.2, softness=1.6)["denoised"])
        for sig in (0.05, 0.2, 0.5, 1.0, 2.0, 5.0):
            noise = jax.random.normal(jax.random.PRNGKey(7), lat.shape) * sig
            den = fwd(lat + noise, jnp.full((BATCH, 1, 1, 1), sig))
            mses[str(sig)] = round(float(jnp.mean((den - lat) ** 2)), 5)

    counter = iter(range(1 << 62))

    def sample_fn(n_req):
        return engine.sample([PROMPT] * n_req, seed=1000 + next(counter))

    def real_stream():
        for imgs in batch_iterator(ds, BATCH, seed=0):
            yield np.asarray(engine.vae.decode(engine.vae.encode(jnp.asarray(imgs))))

    fid = fid_evaluate(sample_fn, real_stream(), RandomConvFeatures(), n=n_fid, batch=BATCH)
    grid = engine.sample([PROMPT] * 16, seed=3)
    save_image_grid(grid, os.path.join(outdir, f"samples_{tag}.png"))
    return {"mse_vs_sigma": mses, "fid": round(float(fid), 4), "n": n_fid,
            "tower": "random-conv", "real_roundtrip": True}


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.data import make_dataset
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_loop import training_hdmoe
    from hdmoe_tpu.train.train_step import init_train_state

    print("device:", jax.devices()[0], flush=True)
    model, optim, loss, mask, run = presets.latent_256_clip(total_steps=STEPS)
    model = replace(model, skip_mode="canonical")
    # dataset="synthetic" (NOT the new native default) so the trajectory and
    # FID stream are directly comparable to artifacts/longrun_canonical
    run = replace(run, dataset="synthetic", save_dir=CKPT, save_interval=STEPS,
                  total_steps=STEPS, log_dir=f"{OUTDIR}/logs",
                  telemetry_every=10, ema_decay=EMA_DECAY)

    t0 = time.time()
    final = training_hdmoe(model, optim, loss, mask, zeta_configs, run)
    train_wall = time.time() - t0
    print(f"training done in {train_wall:.0f}s "
          f"({STEPS * run.batch_size / train_wall:.1f} img/s full loop)", flush=True)

    ds = make_dataset("synthetic", resolution=run.data_img_res, seed=0)

    def load(ckpt_dir):
        params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
        cm = CheckpointManager(ckpt_dir)
        state, _, _ = cm.restore(init_train_state(params0, OptimConfig()), jax.random.PRNGKey(0))
        cm.close()
        return state.params

    results = {"steps": STEPS, "train_wall_s": round(train_wall, 1),
               "full_loop_img_per_sec": round(STEPS * run.batch_size / train_wall, 1),
               "final": {k: float(v) for k, v in final.items()}}
    for tag, ckpt_dir in (("raw", CKPT), ("ema", CKPT + "_ema")):
        results[tag] = eval_weights(tag, model, load(ckpt_dir), ds)
        print(f"[{tag}] {results[tag]}", flush=True)
        with open(f"{OUTDIR}/RESULTS.json", "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
