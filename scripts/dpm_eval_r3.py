"""Round-3 solver dial: DPM-Solver++(2M) vs Heun on the canonical checkpoint.

The Heun sampler costs 2N-1 denoiser evals; DPM-Solver++(2M)
(hdmoe_tpu/sampler/dpm.py) costs N for the same 2nd order on the same
probability-flow ODE. If FID holds at matched NFE and degrades gracefully
below it, the solver knob is a direct serving-throughput multiplier on top
of the round-3 priority-capacity dial (artifacts/serving_dial_r3.json).

Methodology identical to scripts/serving_dial_r3.py — same 2,800-step
canonical checkpoint, random-conv tower, VAE-roundtripped synthetic real
stream, FID@5k, compiled-scan throughput walls with value-fetch barriers —
so rows are directly comparable. Variants:

  heun18   (35 NFE)  x {dense, cf1+priority}   -- same-session controls
  dpm35    (35 NFE)  x {cf1+priority}          -- matched-compute quality
  dpm20    (20 NFE)  x {dense, cf1+priority}   -- the throughput play
  dpm14    (14 NFE)  x {cf1+priority}          -- degradation probe
  heun18 cf1+priority + int8 weights           -- quantization FID spot check

Usage: python scripts/dpm_eval_r3.py [n_fid] [out_json]
Resumable: existing rows in out_json are skipped (engine compiles are the
expensive part through a slow tunnel).
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FID = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
OUT = sys.argv[2] if len(sys.argv) > 2 else "artifacts/dpm_eval_r3.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
BATCH = 32
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

    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()

    dense = replace(base_model, compute_dtype="bfloat16", use_flash=True,
                    dispatch="dense")
    cf1p = replace(base_model, compute_dtype="bfloat16", use_flash=True,
                   dispatch="capacity", capacity_factor=1.0,
                   capacity_policy="priority")
    cf2p = replace(cf1p, capacity_factor=2.0)

    # (name, model_cfg, solver, num_steps, quantize)
    variants = [
        ("heun18_dense", dense, "heun", 18, "none"),
        ("heun18_cf1p", cf1p, "heun", 18, "none"),
        ("dpm35_cf1p", cf1p, "dpmpp2m", 35, "none"),
        ("dpm20_dense", dense, "dpmpp2m", 20, "none"),
        ("dpm20_cf1p", cf1p, "dpmpp2m", 20, "none"),
        ("dpm14_cf1p", cf1p, "dpmpp2m", 14, "none"),
        # weight-only int8 spot check (ops/quant.py): expectation is
        # size-not-speed; this row pins the FID cost on real hardware
        ("heun18_cf1p_int8", cf1p, "heun", 18, "int8"),
        # frontier completion (follow-up window): the quality-at-speed
        # candidate, the dense low-NFE knee, and a Heun low-NFE control
        # (2nd-order single-step degrades where the multistep holds — this
        # row shows the solver choice, not just the NFE count, matters)
        ("dpm20_cf2p", cf2p, "dpmpp2m", 20, "none"),
        ("dpm14_dense", dense, "dpmpp2m", 14, "none"),
        ("heun10_dense", dense, "heun", 10, "none"),
        # does the cf=2.0 quality dial hold at 14 NFE? (cf1p did: ~2.08
        # flat 35->14; if cf2p holds ~1.0 this is ~280 img/s at dense-grade
        # tower-FID)
        ("dpm14_cf2p", cf2p, "dpmpp2m", 14, "none"),
    ]

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    only = os.environ.get("DPM_ONLY", "")
    for name, cfg, solver, num_steps, quantize in variants:
        if only and name not in only.split(","):
            continue
        if name in results:
            print(f"[{name}] already recorded; skipping", flush=True)
            continue
        t0 = time.time()
        engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=num_steps,
                               vae_kind="fake", text_kind="fake", solver=solver,
                               quantize=quantize)
        print(f"[{name}] engine compiled in {time.time()-t0:.0f}s "
              f"(nfe={engine.nfe})", flush=True)

        noise = jax.random.normal(
            jax.random.PRNGKey(1),
            (BATCH, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))
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
            "solver": solver,
            "num_steps": num_steps,
            "quantize": quantize,
            "nfe": engine.nfe,
            "tower": "random-conv",
            "real_roundtrip": True,
        }
        print(f"[{name}] {ips:.1f} img/s @ {engine.nfe} NFE, FID@{N_FID} "
              f"{fid:.3f} (fid wall {time.time()-t0:.0f}s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
