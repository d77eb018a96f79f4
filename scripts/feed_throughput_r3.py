"""Round-3 training-loop feed measurement (VERDICT item 5).

Round-2 finding: the flagship train step computes at 644 img/s but the full
loop ran at 167 img/s — host-bound. Candidate causes: per-image Python data
generation (fixed: presets now default to the native C++ generator),
shallow prefetch (fixed: depth 4), and the per-step device->host telemetry
fetch. This script measures the FULL training loop (no checkpoint saves)
over a few hundred steps for each combination on the flagship config of
record, on one chip. The reported img/s is the loop's own rolling
50-step window at the final print (excludes compile).

Usage: python scripts/feed_throughput_r3.py [steps] [out_json]
"""

import contextlib
import io
import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: skip HF retries
import re
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
OUT = sys.argv[2] if len(sys.argv) > 2 else "artifacts/feed_throughput_r3.json"


def run_once(name, dataset, telemetry_every, steps, steps_per_call=1):
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.train_loop import training_hdmoe

    model, optim, loss, mask, run = presets.latent_256_clip(total_steps=steps)
    model = replace(model, skip_mode="canonical")
    run = replace(
        run, dataset=dataset, telemetry_every=telemetry_every,
        vae="fake", text_encoder="fake", steps_per_call=steps_per_call,
        save_interval=0, total_steps=steps, print_interval=50,
        save_dir=f"/tmp/feed_r3_{name}", log_dir=f"/tmp/feed_r3_{name}_logs",
        run_name=f"feed_{name}",
    )
    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        training_hdmoe(model, optim, loss, mask, zeta_configs, run)
    wall = time.time() - t0
    text = buf.getvalue()
    rates = [float(m) for m in re.findall(r"\| ([0-9.]+) img/s", text)]
    return {
        "steps": steps,
        "wall_s": round(wall, 1),
        "img_per_sec_rolling_final": rates[-1] if rates else None,
        "img_per_sec_rolling_all": rates,
        "img_per_sec_incl_compile": round(steps * run.batch_size / wall, 1),
    }


def main():
    import jax

    print("device:", jax.devices()[0], flush=True)
    results = {}
    combos = [
        ("python_t1", "synthetic", 1, 1),          # round-2 configuration
        ("python_t10", "synthetic", 10, 1),
        ("native_t1", "synthetic-native", 1, 1),
        ("native_t10", "synthetic-native", 10, 1),
        # device-side multi-step loop: K optimizer steps per dispatch
        ("native_k8", "synthetic-native", 10, 8),
        ("native_k16", "synthetic-native", 10, 16),
        # on-device datagen: batch never exists on the host (zero H2D)
        ("device_k1", "synthetic-device", 10, 1),
        ("device_k8", "synthetic-device", 10, 8),
        # probe the periodic ~545->345 img/s stalls seen at telemetry_every=10
        ("device_k8_t50", "synthetic-device", 50, 8),
        # NOTE: the recorded "device_k8_t50_devstats" row was this same
        # config re-run ACROSS code versions (before/after the logger's
        # weight-stats reduction moved on device). On current code the two
        # are identical, so it is not in the default sweep — reproduce the
        # A/B by checking out the pre-fix commit with
        # FEED_ONLY=device_k8_t50_devstats.
    ]
    if os.environ.get("FEED_ONLY", "").find("devstats") >= 0:
        combos.append(("device_k8_t50_devstats", "synthetic-device", 50, 8))
    only = os.environ.get("FEED_ONLY", "")
    if only:
        combos = [c for c in combos if c[0] in only.split(",")]
    # merge into any existing results file (incremental sweeps)
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for name, ds, tel, k in combos:
        # StepTimer's 50-tick rolling window counts CALLS; k>1 runs need
        # k x the steps so the final window excludes the compile call
        # (the round-3 native_k8@300 number was all-window == incl-compile).
        r = run_once(name, ds, tel, STEPS * min(k, 8), steps_per_call=k)
        results[name] = r
        print(f"[{name}] {r}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
