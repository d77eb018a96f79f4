"""Round-3 serving dial: throughput vs FID with the priority capacity policy.

Round-2 root cause (PERF.md "The serving dial"): ALL the quality cost of
capacity dispatch comes from drops — sigma-correlated routing during EDM
sampling makes per-step expert load spiky, and FCFS selection drops routed
tokens to the bare skip path (FID 1.43 -> 2.55 at cf=1.0). Round-3 fix:
``capacity_policy="priority"`` (models/moe.py:reroute_overflow) keeps the
most-confident tokens and reroutes overflow to each token's next-choice
expert. This script re-measures the dial on the SAME 2,800-step canonical
checkpoint: img/s/chip (compiled 35-NFE scan wall, batch 32) + FID@5k
(random-conv tower, VAE-roundtripped synthetic real stream — identical
methodology to artifacts/longrun_canonical/RESULTS.json).

Usage: python scripts/serving_dial_r3.py [n_fid] [out_json]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FID = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
OUT = sys.argv[2] if len(sys.argv) > 2 else "artifacts/serving_dial_r3.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
BATCH = 32
NUM_STEPS = 18  # 35 NFE
PROMPT = "a photo of a flower"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.fid import RandomConvFeatures, fid_evaluate
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.data import batch_iterator, make_dataset
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    print("device:", jax.devices()[0], flush=True)
    base_model, *_ = presets.latent_256_clip(total_steps=2800)
    base_model = replace(base_model, skip_mode="canonical")

    params0 = jax.jit(lambda k: precond_init(k, base_model))(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(CKPT)
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()), jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    # the round-2 methodology: real stream = Python synthetic flowers (the
    # checkpoint's training distribution), VAE-roundtripped through the
    # engine's FakeVAE so FID measures the model, not the autoencoder
    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()

    def fast(cfg_kw):
        return replace(
            base_model, compute_dtype="bfloat16", use_flash=True, **cfg_kw
        )

    variants = {
        "bf16_flash_dense": fast({"dispatch": "dense"}),
        "bf16_flash_cf2_fcfs": fast({"dispatch": "capacity", "capacity_factor": 2.0}),
        "bf16_flash_cf1_fcfs": fast({"dispatch": "capacity", "capacity_factor": 1.0}),
        "bf16_flash_cf2_priority": fast(
            {"dispatch": "capacity", "capacity_factor": 2.0, "capacity_policy": "priority"}
        ),
        "bf16_flash_cf1_priority": fast(
            {"dispatch": "capacity", "capacity_factor": 1.0, "capacity_policy": "priority"}
        ),
    }

    results = {}
    for name, cfg in variants.items():
        t0 = time.time()
        engine = SamplerEngine(
            cfg, params, batch=BATCH, num_steps=NUM_STEPS, vae_kind="fake", text_kind="fake"
        )
        print(f"[{name}] engine compiled in {time.time()-t0:.0f}s", flush=True)

        # throughput: wall of the AOT 35-NFE executable (trustworthy through
        # the tunnel), median of 3
        noise = jax.random.normal(jax.random.PRNGKey(1), (BATCH, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))
        text = engine.clip.encode_text([PROMPT] * BATCH)
        k = jax.random.PRNGKey(2)
        # value fetch, not block_until_ready (PERF.md timing-barrier caveat)
        float(engine._sample(noise, text, k)[0, 0, 0, 0])
        walls = []
        for _ in range(3):
            t0 = time.time()
            float(engine._sample(noise, text, k)[0, 0, 0, 0])
            walls.append(time.time() - t0)
        wall = sorted(walls)[1]
        ips = BATCH / wall

        counter = iter(range(1 << 62))

        def sample_fn(n_req):
            return engine.sample([PROMPT] * n_req, seed=1000 + next(counter))

        def real_stream():
            for imgs in batch_iterator(ds, BATCH, seed=0):
                yield np.asarray(engine.vae.decode(engine.vae.encode(jnp.asarray(imgs))))

        t0 = time.time()
        fid = fid_evaluate(sample_fn, real_stream(), feature_fn, n=N_FID, batch=BATCH)
        results[name] = {
            "img_per_sec_chip": round(ips, 1),
            "sample_wall_s": round(wall, 4),
            "fid": round(float(fid), 4),
            "n": N_FID,
            "nfe": 2 * NUM_STEPS - 1,
            "tower": "random-conv",
            "real_roundtrip": True,
        }
        print(f"[{name}] {ips:.1f} img/s, FID@{N_FID} {fid:.3f} "
              f"(fid wall {time.time()-t0:.0f}s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
