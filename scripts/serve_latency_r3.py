"""Round-3 bucketed-serving tail-latency measurement.

``BucketedEngine`` (hdmoe_tpu/serve.py) exists for one reason: a single
fixed-batch AOT sampler pads a 1-prompt request to the full compiled batch,
so the interactive tail pays throughput-batch latency. This script prices
that on real hardware: per-request wall (engine.sample end-to-end, incl.
VAE decode + host fetch) for a 1-prompt request through engines compiled at
batch 1 / 4 / 16, plus batch-16 throughput for context.

The expectation to confirm or refute: the denoiser is MXU-bound at batch 16
(PERF.md), so batch-1 latency should be well under 16x cheaper per image —
buckets trade throughput for tail latency; the numbers say how much.

Methodology matches scripts/dpm_eval_r3.py: canonical 2,800-step
checkpoint, cf=1.0 + priority capacity (the bench fast path), 18 Heun
steps, value-fetch barriers (PERF.md timing-barrier caveat). Resumable:
existing rows in the output JSON are skipped (compiles are the expensive
part through a slow tunnel).

Usage: python scripts/serve_latency_r3.py [out_json]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/serve_latency_r3.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
BUCKETS = (1, 4, 16)
PROMPT = "a photo of a flower"


def main():
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    print("device:", jax.devices()[0], flush=True)
    base_model, *_ = presets.latent_256_clip(total_steps=2800)
    cfg = replace(base_model, skip_mode="canonical", compute_dtype="bfloat16",
                  use_flash=True, dispatch="capacity", capacity_factor=1.0,
                  capacity_policy="priority")

    params0 = jax.jit(lambda k: precond_init(k, base_model))(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(CKPT)
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()), jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    for b in BUCKETS:
        name = f"bucket_{b}"
        if name in results:
            print(f"[{name}] already recorded; skipping", flush=True)
            continue
        t0 = time.time()
        engine = SamplerEngine(cfg, params, batch=b, num_steps=18,
                               vae_kind="fake", text_kind="fake")
        compile_s = time.time() - t0
        print(f"[{name}] compiled in {compile_s:.0f}s", flush=True)

        # end-to-end single-prompt latency: what a /sample caller waits for
        engine.sample([PROMPT], seed=0)  # warm adapters + executable
        walls = []
        for i in range(5):
            t0 = time.time()
            engine.sample([PROMPT], seed=i)
            walls.append(time.time() - t0)
        lat_1 = sorted(walls)[len(walls) // 2]

        row = {
            "batch": b,
            "request_latency_ms_1_prompt": round(lat_1 * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "nfe": engine.nfe,
        }
        if b > 1:
            # full-bucket throughput for the latency/throughput frontier
            engine.sample([PROMPT] * b, seed=0)
            walls = []
            for i in range(3):
                t0 = time.time()
                engine.sample([PROMPT] * b, seed=i)
                walls.append(time.time() - t0)
            wall_full = sorted(walls)[1]
            row["request_latency_ms_full"] = round(wall_full * 1e3, 1)
            row["img_per_sec_chip_full"] = round(b / wall_full, 1)
        results[name] = row
        print(f"[{name}] 1-prompt {row['request_latency_ms_1_prompt']} ms"
              + (f", full-batch {row.get('img_per_sec_chip_full')} img/s" if b > 1 else ""),
              flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    if all(f"bucket_{b}" in results for b in (1, 16)):
        speedup = (results["bucket_16"]["request_latency_ms_1_prompt"]
                   / results["bucket_1"]["request_latency_ms_1_prompt"])
        results["tail_latency_win_1_vs_16"] = round(speedup, 2)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
