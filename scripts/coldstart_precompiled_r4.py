"""Price the precompiled-executable artifact boot on the real TPU.

Extends serve_coldstart_r4: exports the same fast-config engine with
``precompile=True`` (embedding the PJRT executable), then boots it in a
fresh process with an EMPTY compile cache — if the executable loads, the
boot pays ZERO XLA compile and this arm should beat every other cold arm;
if the axon PJRT plugin can't deserialize it, the loader's guarded
fallback reports it and the arm records the StableHLO numbers with
``precompiled_served: false``.

Usage: python scripts/coldstart_precompiled_r4.py [out_json]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/coldstart_precompiled_r4.json"
ARM_TIMEOUT_S = float(os.environ.get("COLDSTART_ARM_TIMEOUT_S", 1800))

EXPORT_CHILD = r"""
import os, sys, time
t0 = time.time()
sys.path.insert(0, %r)
from dataclasses import replace
import jax
from hdmoe_tpu.models import default_model_config, precond_init
from hdmoe_tpu.serve import SamplerEngine
from hdmoe_tpu.deploy import export_sampler

cfg = replace(default_model_config(), compute_dtype="bfloat16", use_flash=True,
              dispatch="capacity", capacity_factor=1.0, capacity_policy="priority")
params = jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0))
engine = SamplerEngine(cfg, params, batch=32, num_steps=18,
                       vae_kind="fake", text_kind="fake")
meta = export_sampler(engine, os.environ["HDMOE_ARTIFACT"], precompile=True)
assert meta["precompiled_backend"], meta
print("RESULT", time.time() - t0, flush=True)
""" % (REPO,)

BOOT_CHILD = r"""
import os, sys, time
t0 = time.time()
sys.path.insert(0, %r)
from hdmoe_tpu.deploy import load_sampler

engine = load_sampler(os.environ["HDMOE_ARTIFACT"])
t_load = time.time()
img = engine.sample(["a photo of a flower"] * 32, seed=0)
import numpy as np
np.asarray(img[0])
t_first = time.time()
print("RESULT", t_load - t0, t_first - t_load, t_first - t0,
      engine.loaded_precompiled, flush=True)
""" % (REPO,)


def run_child(src, cache_dir, extra_env=None):
    env = dict(os.environ, HDMOE_COMPILE_CACHE=cache_dir, **(extra_env or {}))
    t0 = time.time()
    p = subprocess.Popen([sys.executable, "-c", src], stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True, env=env, cwd=REPO)
    try:
        out, err = p.communicate(timeout=ARM_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        p.kill()
        out, err = p.communicate()
        return {"error": f"child made no result within {ARM_TIMEOUT_S:.0f}s, "
                         "killed by pid (tunnel wedge?)",
                "wall_s": round(time.time() - t0, 1),
                "stderr_tail": (err or "")[-300:]}
    line = [ln for ln in (out or "").splitlines() if ln.startswith("RESULT")]
    if p.returncode != 0 or not line:
        return {"error": (err or out or "")[-500:],
                "wall_s": round(time.time() - t0, 1)}
    return {"fields": line[0].split()[1:],
            "wall_s": round(time.time() - t0, 1),
            "stderr_tail": (err or "")[-300:]}


def main():
    results = {}
    out_path = os.path.join(REPO, OUT)

    def save():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    artifact = os.path.join(tempfile.gettempdir(), "hdmoe_precompiled_r4.hdmoe")
    repo_cache = os.path.join(REPO, ".jax_cache")

    r = run_child(EXPORT_CHILD, repo_cache, {"HDMOE_ARTIFACT": artifact})
    results["export_precompiled"] = (
        {"wall_s": r["wall_s"],
         "artifact_mb": round(os.path.getsize(artifact) / 1e6, 1)}
        if "fields" in r else r)
    print("[export]", results["export_precompiled"], flush=True)
    save()
    if "fields" not in r:
        return

    for tag, cache in (("boot_fresh_cache", None), ("boot_repo_cache", repo_cache)):
        if cache is None:
            tmp = tempfile.TemporaryDirectory(prefix="hdmoe_pc4_")
            cache = tmp.name
        r = run_child(BOOT_CHILD, cache, {"HDMOE_ARTIFACT": artifact})
        if "fields" in r:
            load_s, first_s, total_s, served = r["fields"]
            results[tag] = {
                "import_and_load_s": round(float(load_s), 1),
                "first_batch_s": round(float(first_s), 1),
                "time_to_first_image_s": round(float(total_s), 1),
                "precompiled_served": served == "True",
            }
            tail = r.get("stderr_tail") or ""
            if "precompiled executable unusable" in tail:
                results[tag]["fallback_note"] = tail[-250:]
        else:
            results[tag] = r
        print(f"[{tag}]", results[tag], flush=True)
        save()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
