"""Full-training-loop throughput at the batch knee (follow-up to both
feed_throughput_r3 and train_batch_knee_r3).

The sustained number of record — 588 img/s, 96% of roofline
(feed_throughput_r3_idle.json) — was measured at batch 32, and
train_batch_knee_r3.json moved the compute roofline itself: 1209.7 img/s
at b128 fp32+flash, 1443 at b256 bf16. This measures the FULL loop
(dataset="synthetic-device", steps_per_call=8, telemetry_every=50 — the
winning round-3 configuration) at those batches, plus the b32 control so
the session's host load is visible. Rolling-window img/s from the loop's
own prints (excludes compile), same as feed_throughput_r3.

Usage: python scripts/feed_b128_r3.py [out_json]
"""

import contextlib
import io
import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
import re
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/feed_b128_r3.json"


def run_once(name, batch, steps, model_kw):
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.train_loop import training_hdmoe

    model, optim, loss, mask, run = presets.latent_256_clip(total_steps=steps)
    model = replace(model, skip_mode="canonical", **model_kw)
    run = replace(
        run, dataset="synthetic-device", telemetry_every=50,
        vae="fake", text_encoder="fake", steps_per_call=8,
        batch_size=batch, save_interval=0, total_steps=steps,
        print_interval=50,
        save_dir=f"/tmp/feed_b128_{name}", log_dir=f"/tmp/feed_b128_{name}_logs",
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
        "batch": batch,
        "steps": steps,
        "wall_s": round(wall, 1),
        "img_per_sec_rolling_final": rates[-1] if rates else None,
        "img_per_sec_rolling_all": rates,
        "img_per_sec_incl_compile": round(steps * batch / wall, 1),
    }


def main():
    import jax

    print("device:", jax.devices()[0], flush=True)
    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    arms = [
        ("b32_control", 32, 800, {}),
        ("b128", 128, 600, {}),
        ("b256_bf16", 256, 400, {"compute_dtype": "bfloat16"}),
    ]
    for name, batch, steps, kw in arms:
        if name in results:
            continue
        try:
            results[name] = run_once(name, batch, steps, kw)
        except Exception as e:
            results[name] = {"batch": batch, "error": f"{type(e).__name__}: {e}"[:400]}
        print(f"[{name}] {results[name]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
