"""Serving cold-start: time-to-first-image with and without the compile cache.

The persistent XLA compilation cache (hdmoe_tpu/compilecache.py) turns the
SamplerEngine's AOT compile — minutes through the tunnel — into a disk
load. This script prices the user-visible version of that: wall-clock from
process start to the first sampled image for a fresh `serve`-style engine,
measured in subprocesses so each run pays true import + backend-init +
compile cost:

  cold  HDMOE_COMPILE_CACHE=<fresh dir>   (compile from scratch, then populate)
  warm  same dir, second run              (executable loaded from disk)

Reference anchor: the reference pays torch model construction + eager
warmup per process (Utils/training.py:273-341) and cannot persist compiled
state at all.

Usage: python scripts/serve_coldstart_r3.py [out_json]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/serve_coldstart_r3.json"

CHILD = r"""
import os, sys, time
t0 = time.time()
sys.path.insert(0, %r)
from dataclasses import replace
import jax
from hdmoe_tpu.models import default_model_config, precond_init
from hdmoe_tpu.serve import SamplerEngine

cfg = replace(default_model_config(), compute_dtype="bfloat16", use_flash=True,
              dispatch="capacity", capacity_factor=1.0, capacity_policy="priority")
params = jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0))
t_init = time.time()
engine = SamplerEngine(cfg, params, batch=32, num_steps=18,
                       vae_kind="fake", text_kind="fake")
t_engine = time.time()
img = engine.sample(["a photo of a flower"] * 32, seed=0)
import numpy as np
np.asarray(img[0])  # force the fetch: first image actually in hand
t_first = time.time()
print("RESULT", t_init - t0, t_engine - t_init, t_first - t_engine, t_first - t0,
      flush=True)
""" % (REPO,)


def run_once(cache_dir):
    env = dict(os.environ, HDMOE_COMPILE_CACHE=cache_dir)
    t0 = time.time()
    p = subprocess.run([sys.executable, "-c", CHILD], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=3600)
    wall = time.time() - t0
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
    if p.returncode != 0 or not line:
        return {"error": (p.stderr or p.stdout)[-500:], "wall_s": round(wall, 1)}
    init_s, engine_s, first_s, total_s = map(float, line[0].split()[1:])
    return {
        "import_and_param_init_s": round(init_s, 1),
        "engine_compile_s": round(engine_s, 1),
        "first_batch_s": round(first_s, 1),
        "time_to_first_image_s": round(total_s, 1),
        "subprocess_wall_s": round(wall, 1),
    }


def main():
    results = {}
    with tempfile.TemporaryDirectory(prefix="hdmoe_coldstart_") as cache:
        results["cold_fresh_cache"] = run_once(cache)
        print("[cold]", results["cold_fresh_cache"], flush=True)
        results["warm_same_cache"] = run_once(cache)
        print("[warm]", results["warm_same_cache"], flush=True)
    # third run against the repo's standing cache (what a real redeploy sees)
    results["warm_repo_cache"] = run_once(os.path.join(REPO, ".jax_cache"))
    print("[repo]", results["warm_repo_cache"], flush=True)
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
