"""Deploy-path validation on real TPU at flagship scale.

Exports the bench fast path (bf16 + flash + cf1 + priority, canonical
2,800-step weights) to a serving artifact (hdmoe_tpu.deploy), loads it back,
and checks (a) images match the live engine within re-fusion tolerance,
(b) artifact-served throughput ~= engine throughput.

On the divergence contract: the first run of this script asserted strict
bit-identity and FAILED on real TPU — that was the CPU fp32 contract
(tests/test_deploy.py, where the artifact IS bit-identical) misapplied to
the bf16 fast path. The deserialized StableHLO recompiles as a fresh XLA
module whose fusion choices can differ from the live jit's, and under
bf16 arithmetic that flips uint8 pixels sitting on rounding knife edges —
the same effect already pinned for baked int8 constants
(tests/test_quant.py::test_export_int8_artifact_smaller_and_faithful).
This run records the measured divergence (fraction of differing pixels,
max/mean abs diff) and asserts the quantified contract instead:
<= 0.1% pixels differing, mean |diff| < 0.5, max |diff| <= 2.

Flash uses Pallas => the artifact is TPU-only (Mosaic lowering is
per-backend); this run is exactly the supported production flow: export on
the serving platform. Writes artifacts/deploy_r3.json.

Usage: python scripts/deploy_r3.py [out_json]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/deploy_r3.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
BATCH = 32
NUM_STEPS = 18
N_TIMED = 8  # batches per timed wall (>= 30 s total through the tunnel)


def main():
    import jax
    import numpy as np

    from hdmoe_tpu.deploy import export_sampler, load_sampler
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    print("device:", jax.devices()[0], flush=True)
    base_model, *_ = presets.latent_256_clip(total_steps=2800)
    cfg = replace(
        base_model, skip_mode="canonical", compute_dtype="bfloat16",
        use_flash=True, dispatch="capacity", capacity_factor=1.0,
        capacity_policy="priority",
    )
    params0 = jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0))
    cm = CheckpointManager(CKPT)
    state, _, _ = cm.restore(init_train_state(params0, OptimConfig()), jax.random.PRNGKey(0))
    cm.close()

    t0 = time.time()
    engine = SamplerEngine(cfg, state.params, batch=BATCH, num_steps=NUM_STEPS,
                           vae_kind="fake", text_kind="fake")
    t_engine = time.time() - t0
    print(f"engine compiled in {t_engine:.0f}s", flush=True)

    path = "artifacts/flagship_fast.hdmoe"
    t0 = time.time()
    meta = export_sampler(engine, path)
    t_export = time.time() - t0
    size = os.path.getsize(path)
    print(f"exported {path} ({size/1e6:.1f} MB, platforms={meta['platforms']}) "
          f"in {t_export:.0f}s", flush=True)

    t0 = time.time()
    loaded = load_sampler(path)
    imgs_l = loaded.sample(["a photo of a flower"] * BATCH, seed=7)
    t_load_first = time.time() - t0
    imgs_e = engine.sample(["a photo of a flower"] * BATCH, seed=7)
    identical = bool(np.array_equal(imgs_e, imgs_l))
    a, b = imgs_e.astype(np.int32), imgs_l.astype(np.int32)
    frac_diff = float((a != b).mean())
    max_abs = int(np.abs(a - b).max()) if a.size else 0
    mean_abs = float(np.abs(a - b).mean())
    print(f"loaded+first-sample in {t_load_first:.0f}s; identical={identical} "
          f"frac_diff={frac_diff:.2e} max_abs={max_abs} mean_abs={mean_abs:.4f}",
          flush=True)

    def wall(fn):
        fn(0)  # warm
        t0 = time.perf_counter()
        for i in range(N_TIMED):
            out = fn(i + 1)
        float(out[0].mean())  # value-fetch completion barrier (tunnel!)
        return (time.perf_counter() - t0) / N_TIMED

    prompts = ["a photo of a flower"] * BATCH
    w_engine = wall(lambda s: engine.sample(prompts, seed=s))
    w_loaded = wall(lambda s: loaded.sample(prompts, seed=s))
    res = {
        "identical_images": identical,
        "frac_pixels_diff": frac_diff,
        "max_abs_diff": max_abs,
        "mean_abs_diff": round(mean_abs, 5),
        "artifact_bytes": size,
        "platforms": meta["platforms"],
        "engine_img_per_sec": round(BATCH / w_engine, 1),
        "artifact_img_per_sec": round(BATCH / w_loaded, 1),
        "engine_compile_s": round(t_engine, 1),
        "export_s": round(t_export, 1),
        "load_plus_first_sample_s": round(t_load_first, 1),
        "batch": BATCH,
        "nfe": 2 * NUM_STEPS - 1,
    }
    print(json.dumps(res, indent=1), flush=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    assert frac_diff <= 1e-3, f"{frac_diff:.2e} of pixels differ (> 0.1%)"
    assert mean_abs < 0.5, f"mean |diff| {mean_abs}"
    assert max_abs <= 2, f"max |diff| {max_abs} (expected knife-edge rounding only)"


if __name__ == "__main__":
    main()
