"""Reference-faithful throughput baseline (VERDICT r4 item 3).

The repo's ``vs_baseline`` ratio divides the headline by an OPTIMIZED fp32
dense parity sampler — a single lax.scan XLA program, i.e. the strongest
possible stand-in for the reference. The reference's real execution model is
weaker: a host-side Python loop that issues 2 model launches per Heun step
and synchronizes with the host between steps (Utils/EDM_sampler.py:90-107 —
the loop indexes ``t_steps`` on the host and steps tensors eagerly;
Utils/training.py:313 pins num_steps=40 → 79 NFE, batch 32, fp32, dense
dispatch — the reference has no capacity dispatch at all).

This script reproduces that execution model on this chip with OUR model:
  - fp32, dispatch="dense", batch 32, flagship config of record;
  - 40 Karras steps (79 NFE: 2 evals/step except the last);
  - the denoiser jitted ONCE per eval shape (torch eager still runs
    compiled CUDA kernels; per-op dispatch through the TPU tunnel would be
    absurdly unfair in the other direction), but each Heun step is two
    SEPARATE host->device launches with host-side schedule math between;
  - arm "sync" adds a per-step host value fetch (the reference's eager
    per-step host interaction; also the only barrier the tunnel respects);
  - arm "nosync" only fetches at the end (generous-to-the-reference bound:
    pure launch-pipelined host loop).

Output settles the ">10x reference images/sec/chip" north star with an
honest denominator: BOTH the host-loop number measured here and the
optimized-parity number bench.py already records.

Usage: python scripts/ref_faithful_baseline_r5.py [reps]
Writes artifacts/ref_faithful_baseline_r5.json (incremental per-arm).
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/ref_faithful_baseline_r5.json"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
BATCH = 32
NUM_STEPS = 40  # reference config of record: 79 NFE (Utils/training.py:313)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.compilecache import enable_persistent_cache
    from hdmoe_tpu.models import precond_apply, precond_init
    from hdmoe_tpu.sampler.edm import EDMSamplerConfig, karras_sigma_schedule, make_denoiser
    from hdmoe_tpu.train import presets

    enable_persistent_cache()
    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    print("device:", jax.devices()[0], flush=True)
    model, *_ = presets.latent_256_clip(total_steps=100)
    from dataclasses import replace

    model = replace(model, compute_dtype="float32", use_flash=False,
                    dispatch="dense", skip_mode="canonical")

    params = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    scfg = EDMSamplerConfig(num_steps=NUM_STEPS, sigma_min=0.002, sigma_max=80.0,
                            rho=7.0, guidance=1.0)
    t_steps = np.asarray(karras_sigma_schedule(scfg))  # host-side schedule math

    precond = partial(precond_apply, params, model)
    denoise = jax.jit(
        make_denoiser(precond, model.num_experts, -1.2, 1.6, guidance=1.0)
    )

    text = jnp.zeros((BATCH, 77, model.text_emb_dim), dtype=jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (BATCH, model.img_resolution, model.img_resolution,
                               model.in_channels), dtype=jnp.float32)

    def host_loop_sample(sync_each_step: bool):
        """The reference's Heun loop, host-side (EDM_sampler.py:90-107)."""
        x = noise * float(t_steps[0])
        for i in range(NUM_STEPS):
            t_cur = float(t_steps[i])
            t_next = float(t_steps[i + 1])
            denoised = denoise(x, jnp.full((1, 1, 1, 1), t_cur), text)
            d_cur = (x - denoised) / t_cur
            x_e = x + (t_next - t_cur) * d_cur
            if i < NUM_STEPS - 1:  # 2nd launch: trapezoidal correction
                denoised_p = denoise(x_e, jnp.full((1, 1, 1, 1), t_next), text)
                d_prime = (x_e - denoised_p) / t_next
                x = x + (t_next - t_cur) * (0.5 * d_cur + 0.5 * d_prime)
            else:
                x = x_e
            if sync_each_step:
                float(x[0, 0, 0, 0])  # host value fetch: the eager-torch sync
        float(x[0, 0, 0, 0])  # final barrier (tunnel-safe)
        return x

    for name, sync in (("ref_hostloop_sync", True), ("ref_hostloop_nosync", False)):
        if name in results:
            print(f"[{name}] cached: {results[name]}", flush=True)
            continue
        t0 = time.time()
        host_loop_sample(sync)  # warmup: compiles both eval shapes
        compile_s = time.time() - t0
        walls = []
        for _ in range(REPS):
            t0 = time.time()
            host_loop_sample(sync)
            walls.append(time.time() - t0)
        wall = min(walls)
        nfe = 2 * NUM_STEPS - 1
        ips = BATCH / wall
        results[name] = {
            "img_per_sec_chip": round(ips, 3),
            "img_per_sec_35nfe_equiv": round(ips * nfe / 35.0, 3),
            "wall_s_per_batch": round(wall, 3),
            "walls": [round(w, 3) for w in walls],
            "batch": BATCH, "num_steps": NUM_STEPS, "nfe": nfe,
            "dtype": "float32", "dispatch": "dense",
            "per_step_host_sync": sync,
            "compile_s": round(compile_s, 1),
        }
        print(f"[{name}] {results[name]}", flush=True)
        save()

    # Context numbers for the README sentence.
    results["context"] = {
        "headline_img_per_sec_35nfe": 345.57,  # BENCH_r04.json
        "optimized_parity_f32_dense_img_per_sec": 116.92,  # bench.py parity arm
        "note": ("host-loop arms run the reference's execution model (2 "
                 "launches/step + host math, per-step sync in arm 1) on the "
                 "same chip; the tunnel adds ~10 ms/launch that a local "
                 "accelerator would not pay — recorded walls include it."),
    }
    for name in ("ref_hostloop_sync", "ref_hostloop_nosync"):
        r = results[name]
        r["headline_ratio_at_35nfe_equiv"] = round(
            results["context"]["headline_img_per_sec_35nfe"]
            / r["img_per_sec_35nfe_equiv"], 2)
    save()
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
