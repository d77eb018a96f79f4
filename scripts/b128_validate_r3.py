"""Validate the batch-128 fast path before adopting it in bench.py.

The batch sweep (artifacts/batch_sweep_r3.json) measured the 35-NFE Heun
fast path at +12.6% throughput from batch 32 -> 128 in one session
(183.8 -> 207.0). Before bench.py adopts a bigger batch, two checks:

  1. throughput at batch 256 (is 128 the knee?);
  2. FID@5k of cf=1.0-priority at batch 128 — capacity scales with batch
     (cap = cf*B/E) and priority reranks across a 4x larger pool, so drop
     patterns change; the dial's quality claim must be re-pinned at the
     serving batch (the composition check taught exactly this lesson).

Writes artifacts/b128_validate_r3.json (resumable).
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/b128_validate_r3.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
PROMPT = "a photo of a flower"
N_FID = 5000


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
    model = replace(model, skip_mode="canonical", compute_dtype="bfloat16",
                    use_flash=True, dispatch="capacity", capacity_factor=1.0,
                    capacity_policy="priority")
    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(CKPT)
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()),
                               jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    def throughput(engine, batch):
        noise = jax.random.normal(jax.random.PRNGKey(1),
                                  (batch, model.img_resolution,
                                   model.img_resolution, model.in_channels))
        text = engine.clip.encode_text([PROMPT] * batch)
        k = jax.random.PRNGKey(2)
        float(engine._sample(noise, text, k)[0, 0, 0, 0])
        walls = []
        for _ in range(5):
            t0 = time.time()
            float(engine._sample(noise, text, k)[0, 0, 0, 0])
            walls.append(time.time() - t0)
        return sorted(walls)[len(walls) // 2]

    for batch, want_fid in ((128, True), (256, True), (512, True), (1024, False)):
        name = f"heun18_cf1p_b{batch}"
        if name in results:
            print(f"[{name}] recorded; skipping", flush=True)
            continue
        t0 = time.time()
        engine = SamplerEngine(model, params, batch=batch, num_steps=18,
                               vae_kind="fake", text_kind="fake")
        print(f"[{name}] compiled in {time.time()-t0:.0f}s", flush=True)
        wall = throughput(engine, batch)
        row = {"img_per_sec_chip": round(batch / wall, 1),
               "sample_wall_s": round(wall, 4), "batch": batch, "nfe": 35}
        if want_fid:
            ds = make_dataset("synthetic", resolution=256, seed=0)
            feature_fn = RandomConvFeatures()
            counter = iter(range(1 << 62))

            def sample_fn(n_req):
                return engine.sample([PROMPT] * n_req, seed=1000 + next(counter))

            def real_stream():
                for imgs in batch_iterator(ds, batch, seed=0):
                    yield np.asarray(engine.vae.decode(engine.vae.encode(jnp.asarray(imgs))))

            t0 = time.time()
            fid = fid_evaluate(sample_fn, real_stream(), feature_fn,
                               n=N_FID, batch=batch)
            row.update(fid=round(float(fid), 4), n=N_FID, tower="random-conv",
                       real_roundtrip=True, fid_wall_s=round(time.time() - t0, 1))
        results[name] = row
        print(f"[{name}] {json.dumps(row)}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
