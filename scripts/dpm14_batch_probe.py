"""Throughput-only probe: does batch 64 beat 32 on the 14-NFE dial?

The round-3 batch sweep (batch_sweep_r3) chose 32 at 35-NFE Heun; at 14
NFE the per-step weight traffic and dispatch overheads amortize over
fewer steps, so the optimum may shift. Throughput only (the dial's FID is
batch-independent); value-fetch barriers per PERF.md.
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/dpm14_batch_probe.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")


def main():
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train.checkpoint import CheckpointManager
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
    for batch in (32, 64, 128, 256, 512):
        name = f"dpm14_cf1p_b{batch}"
        if name in results:
            continue
        t0 = time.time()
        engine = SamplerEngine(model, params, batch=batch, num_steps=14,
                               vae_kind="fake", text_kind="fake", solver="dpmpp2m")
        print(f"[{name}] compiled in {time.time()-t0:.0f}s", flush=True)
        noise = jax.random.normal(jax.random.PRNGKey(1),
                                  (batch, model.img_resolution,
                                   model.img_resolution, model.in_channels))
        text = engine.clip.encode_text(["a photo of a flower"] * batch)
        k = jax.random.PRNGKey(2)
        float(engine._sample(noise, text, k)[0, 0, 0, 0])  # warm + barrier
        walls = []
        for _ in range(5):
            t0 = time.time()
            float(engine._sample(noise, text, k)[0, 0, 0, 0])
            walls.append(time.time() - t0)
        wall = sorted(walls)[len(walls) // 2]
        results[name] = {"img_per_sec_chip": round(batch / wall, 1),
                         "sample_wall_s": round(wall, 4), "batch": batch,
                         "nfe": 14}
        print(f"[{name}] {batch / wall:.1f} img/s", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
