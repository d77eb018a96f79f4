"""FID-pin the batch-512 serving frontier rows.

The heun18+cf1p validation showed dial FID is batch-flat (1.970/1.973/
1.973 at b128/256/512); this pins the same property on the two frontier
rows users will actually serve:

  - dpm14 + cf1-priority @ b512 (the throughput end: 670.4 img/s)
  - dpm20 + cf2-priority @ b512 (the quality sweet spot at its knee)

Methodology: scripts/dpm_eval_r3.py (FID@5k, random-conv tower,
VAE-roundtripped real stream, value-fetch barriers).
Writes artifacts/frontier_b512_r3.json (resumable).
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/frontier_b512_r3.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
PROMPT = "a photo of a flower"
N_FID = 5000
BATCH = 512


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

    print("device:", jax.devices()[0], flush=True)
    model, _, _, _, _ = latent_256_clip()
    base = replace(model, skip_mode="canonical", compute_dtype="bfloat16",
                   use_flash=True, dispatch="capacity",
                   capacity_policy="priority")
    params0 = jax.jit(lambda k: precond_init(k, base))(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(CKPT)
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()),
                               jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()
    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    variants = [
        ("dpm14_cf1p_b512", replace(base, capacity_factor=1.0), "dpmpp2m", 14),
        ("dpm20_cf2p_b512", replace(base, capacity_factor=2.0), "dpmpp2m", 20),
    ]
    for name, cfg, solver, steps in variants:
        if name in results:
            print(f"[{name}] recorded; skipping", flush=True)
            continue
        t0 = time.time()
        engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=steps,
                               vae_kind="fake", text_kind="fake", solver=solver)
        print(f"[{name}] compiled in {time.time()-t0:.0f}s", flush=True)
        noise = jax.random.normal(jax.random.PRNGKey(1),
                                  (BATCH, cfg.img_resolution,
                                   cfg.img_resolution, cfg.in_channels))
        text = engine.clip.encode_text([PROMPT] * BATCH)
        k = jax.random.PRNGKey(2)
        float(engine._sample(noise, text, k)[0, 0, 0, 0])
        walls = []
        for _ in range(5):
            t0 = time.time()
            float(engine._sample(noise, text, k)[0, 0, 0, 0])
            walls.append(time.time() - t0)
        wall = sorted(walls)[len(walls) // 2]

        counter = iter(range(1 << 62))

        def sample_fn(n_req):
            return engine.sample([PROMPT] * n_req, seed=1000 + next(counter))

        def real_stream():
            for imgs in batch_iterator(ds, BATCH, seed=0):
                yield np.asarray(engine.vae.decode(engine.vae.encode(jnp.asarray(imgs))))

        t0 = time.time()
        fid = fid_evaluate(sample_fn, real_stream(), feature_fn, n=N_FID, batch=BATCH)
        results[name] = {"img_per_sec_chip": round(BATCH / wall, 1),
                         "sample_wall_s": round(wall, 4),
                         "fid": round(float(fid), 4), "n": N_FID,
                         "solver": solver, "num_steps": steps,
                         "nfe": engine.nfe, "batch": BATCH,
                         "tower": "random-conv", "real_roundtrip": True,
                         "fid_wall_s": round(time.time() - t0, 1)}
        print(f"[{name}] {json.dumps(results[name])}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
