"""Round-3 continuous-batching (serve_stream.py) serving A/B on real TPU.

What continuous batching buys — and costs — vs the lockstep engines:

  * Lockstep (BatchingFrontend, pipelined): a request arriving while a
    batch is mid-trajectory waits for the WHOLE remaining 35-NFE scan
    before its own denoising starts — under streaming load the latency
    tail carries up to one full batch wall of queueing.
  * Streaming (StreamingFrontend): a request is admitted into free slots
    at the next solver tick, paying only its own trajectory (+ tick
    granularity). The cost: one device dispatch per tick instead of one
    per trajectory (the tunnel's ~10 ms floor x 18), a full-buffer VAE
    decode + D2H per finishing tick, and 2N vs 2N-1 denoiser evals.

Three measurements per arm, all on the canonical checkpoint with the
bench fast-path config (bf16 + flash + cf1 + priority, 18 Heun steps,
batch/slots = 32):

  lone    — single 1-prompt request on an idle engine (p50 of 5)
  sat     — closed-loop saturation: 64 back-to-back 1-prompt clients,
            >= 30 s (served img/s; prices the streaming dispatch tax)
  poisson — open-loop Poisson arrivals of 1-prompt requests at fixed
            absolute rates (same for every arm), p50/p95/p99 latency +
            achieved throughput. Open-loop is the honest serving load:
            queue growth shows up as tail latency, not as a slower
            request generator.

Resumable: existing keys in the output JSON are skipped.
Usage: python scripts/serve_stream_r3.py [out_json]
"""

import json
import os
import sys
import threading
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/serve_stream_r3.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
SLOTS = 32
SAT_CLIENTS = 64
SAT_WALL = 30.0
POISSON_RATES = (20.0, 60.0)  # 1-prompt requests / s, ~0.1x and ~0.33x capacity
POISSON_WALL = 25.0
PROMPT = "a photo of a flower"


def lone_latency(fe, n=5):
    fe.submit([PROMPT], seed=0)  # warm
    walls = []
    for i in range(n):
        t0 = time.perf_counter()
        fe.submit([PROMPT], seed=i)
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[n // 2]


def saturation(fe, clients=SAT_CLIENTS, min_wall=SAT_WALL):
    done = threading.Event()
    count = [0]
    lock = threading.Lock()

    def client(i):
        s = i
        while not done.is_set():
            fe.submit([PROMPT], seed=s)
            with lock:
                count[0] += 1
            s += clients

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(min_wall)
    with lock:
        n0, t_mark = count[0], time.perf_counter()
    time.sleep(min_wall)
    with lock:
        n1, t_end = count[0], time.perf_counter()
    done.set()
    for t in threads:
        t.join(timeout=60)
    return (n1 - n0) / (t_end - t_mark)  # steady-state img/s (1 img/request)


def poisson_load(fe, rate, wall=POISSON_WALL, seed0=1000):
    """Open-loop: arrivals at exponential gaps, each in its own thread."""
    import random

    rng = random.Random(7)
    lats, errs = [], []
    lock = threading.Lock()
    threads = []
    t_start = time.perf_counter()
    s = seed0
    next_t = 0.0
    while next_t < wall:
        now = time.perf_counter() - t_start
        if now < next_t:
            time.sleep(next_t - now)

        def one(seed):
            t0 = time.perf_counter()
            try:
                fe.submit([PROMPT], seed=seed)
                with lock:
                    lats.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errs.append(str(e))

        th = threading.Thread(target=one, args=(s,), daemon=True)
        th.start()
        threads.append(th)
        s += 1
        next_t += rng.expovariate(rate)
    for th in threads:
        th.join(timeout=300)
    total_wall = time.perf_counter() - t_start
    lats.sort()

    def q(p):
        return lats[min(len(lats) - 1, int(p * len(lats)))] if lats else None

    return {
        "rate_req_s": rate,
        "completed": len(lats),
        "errors": len(errs),
        "achieved_img_s": round(len(lats) / total_wall, 1),
        "p50_ms": round(q(0.50) * 1e3, 1) if lats else None,
        "p95_ms": round(q(0.95) * 1e3, 1) if lats else None,
        "p99_ms": round(q(0.99) * 1e3, 1) if lats else None,
    }


def main():
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.serve import BatchingFrontend, SamplerEngine
    from hdmoe_tpu.serve_stream import StreamingEngine, StreamingFrontend
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
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()),
                               jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    def build(kind):
        t0 = time.time()
        if kind == "lockstep":
            eng = SamplerEngine(cfg, params, batch=SLOTS, num_steps=18)
            fe = BatchingFrontend(eng, pipeline=True)
        else:
            k = int(kind.split("_k")[1])
            eng = StreamingEngine(cfg, params, batch=SLOTS, num_steps=18,
                                  ticks_per_call=k)
            fe = StreamingFrontend(eng)
        print(f"[{kind}] compiled in {time.time() - t0:.0f}s", flush=True)
        return fe

    for kind in ("lockstep", "stream_k1", "stream_k3"):
        if kind in results:
            print(f"[{kind}] already recorded; skipping", flush=True)
            continue
        fe = build(kind)
        row = {"slots": SLOTS, "nfe_per_image": fe.engine.nfe
               if hasattr(fe.engine, "nfe") else None}
        row["lone_latency_ms"] = round(lone_latency(fe) * 1e3, 1)
        print(f"[{kind}] lone {row['lone_latency_ms']} ms", flush=True)
        row["sat_img_s"] = round(saturation(fe), 1)
        print(f"[{kind}] sat {row['sat_img_s']} img/s", flush=True)
        row["poisson"] = []
        for rate in POISSON_RATES:
            p = poisson_load(fe, rate)
            row["poisson"].append(p)
            print(f"[{kind}] poisson@{rate}: {p}", flush=True)
        results[kind] = row
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
