"""Round-3 pipelined-serving measurement: dispatch/fetch overlap.

scripts/serve_latency_r3.py priced the END-TO-END request path (denoiser
scan + VAE decode + D2H fetch + host split, all serialized per request)
well below the raw sampler rate. The pipelined ``BatchingFrontend``
(hdmoe_tpu/serve.py) keeps ONE coalesced batch in flight: batch N+1's
device work is dispatched (async JAX enqueue) before batch N's pixels are
fetched, overlapping the next denoiser scan with the previous D2H + host
work.

This script measures sustained served throughput through the frontend
under back-to-back load (client threads that immediately resubmit), with
``pipeline=True`` vs ``pipeline=False`` on the same engine — the only
difference is the overlap. Methodology matches scripts/dpm_eval_r3.py:
canonical 2,800-step checkpoint, bench fast path (bf16 + flash + cf=1.0
priority), 18 Heun steps, wall >= 30 s per leg, first leg discarded as
warmup (compile + cache effects).

Usage: python scripts/serve_pipeline_r3.py [out_json]
Writes artifacts/serve_pipeline_r3.json. Resumable: existing keys skipped.
"""

import json
import os
import sys
import threading
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/serve_pipeline_r3.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
BATCH = 32
REQ = 8          # prompts per request (4 requests coalesce into one batch)
CLIENTS = 8      # back-to-back submitters: keeps >=1 full batch queued
MIN_WALL = 30.0


def measure(fe) -> float:
    """Sustained img/s through the frontend with CLIENTS resubmitting."""
    done = threading.Event()
    count = [0]
    lock = threading.Lock()

    def client(i):
        s = i
        while not done.is_set():
            fe.submit(["a photo of a flower"] * REQ, seed=s)
            with lock:
                count[0] += REQ
            s += CLIENTS
        # one more submit would block the pool; just exit

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(CLIENTS)]
    t0 = time.time()
    for t in threads:
        t.start()
    while time.time() - t0 < MIN_WALL:
        time.sleep(1.0)
    done.set()
    # drain: wait for in-flight submits to return (threads exit after their
    # current blocking submit completes)
    for t in threads:
        t.join(timeout=300)
    wall = time.time() - t0
    with lock:
        return count[0] / wall


def main():
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.serve import BatchingFrontend, SamplerEngine
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.presets import latent_256_clip
    from hdmoe_tpu.train.train_step import init_train_state

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

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

    t0 = time.time()
    engine = SamplerEngine(model, params, batch=BATCH, num_steps=18,
                           vae_kind="fake", text_kind="fake")
    print(f"engine compiled in {time.time() - t0:.0f}s", flush=True)

    # warmup leg (compile/dispatch caches); not recorded
    fe_warm = BatchingFrontend(engine, pipeline=False)
    fe_warm.submit(["w"] * REQ, seed=0)

    for name, pipe in (("sequential", False), ("pipelined", True)):
        if name in results:
            print(f"[{name}] already recorded; skipping", flush=True)
            continue
        fe = BatchingFrontend(engine, pipeline=pipe)
        rate = measure(fe)
        results[name] = {"img_per_sec_served": round(rate, 1), "batch": BATCH,
                         "req_size": REQ, "clients": CLIENTS, "nfe": 35}
        print(f"[{name}] {rate:.1f} img/s served", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    if "sequential" in results and "pipelined" in results:
        results["speedup"] = round(
            results["pipelined"]["img_per_sec_served"]
            / results["sequential"]["img_per_sec_served"], 3)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
