"""Round-3 conv-wall A/Bs on the flagship sampler (VERDICT item 1).

PERF.md "Remaining headroom": convs are ~60% of eval at 18% MFU and the
kernel-level floor is ~250 img/s vs the 207 headline. The named-but-untried
candidates, measured here post-flash/cf1 (the round-2 rejection data was
pre-flash with a different baseline):

  A  control: bf16 + flash + capacity cf=1.0 (the 207.3 img/s headline)
  B  A + dispatch="grouped" (shape-class banked experts: 2+2 classes ->
     per-conv batch doubles, half the expert programs)
  C  B + conv_impl="pallas" (VMEM-im2col conv inside the banked experts)
  D  A + conv_impl="pallas" (control for C)
  E  A + capacity_policy="priority" (throughput cost of the round-3
     quality fix; its FID side lives in serving_dial_r3.py)
  F  B at batch 64 (bank batching may shift the optimal batch)

Measurement: wall of ONE compiled 35-NFE scan (the trustworthy number
through the tunnel), median of 3, folded weights.

Usage: python scripts/perf_round3.py [out_json]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/perf_round3.json"
HEUN_STEPS = 18


def measure(cfg, params, batch):
    import jax
    import jax.numpy as jnp

    from hdmoe_tpu.models import precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser

    key = jax.random.PRNGKey(0)
    text = jax.random.normal(key, (batch, 77, cfg.text_emb_dim))
    noise = jax.random.normal(key, (batch, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))

    def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
        return precond_apply(
            params, cfg, x, sigma, text_emb, m1, m2, zeta,
            transition_point=transition_point, softness=softness,
        )

    den = make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)
    scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)
    t0 = time.time()
    with mp_ops.prenormalized_weights():
        sample = jax.jit(lambda n: edm_sample(den, n, text, scfg)).lower(noise).compile()
    compile_s = time.time() - t0
    # value fetch, not block_until_ready: the latter can return before the
    # tunnel queue drains (PERF.md round-3 timing-barrier caveat)
    float(sample(noise)[0, 0, 0, 0])
    walls = []
    for _ in range(3):
        t0 = time.time()
        float(sample(noise)[0, 0, 0, 0])
        walls.append(time.time() - t0)
    wall = sorted(walls)[1]
    return {
        "img_per_sec": round(batch / wall, 1),
        "wall_s": round(wall, 4),
        "ms_per_eval": round(wall / (2 * HEUN_STEPS - 1) * 1e3, 3),
        "batch": batch,
        "compile_s": round(compile_s, 1),
    }


def main():
    import jax

    from hdmoe_tpu.models import default_model_config, precond_init
    from hdmoe_tpu.train.optim import project_mp_weights

    print("device:", jax.devices()[0], flush=True)
    base = default_model_config()
    params = jax.jit(lambda k: precond_init(k, base))(jax.random.PRNGKey(0))
    folded = project_mp_weights(params)

    fast = replace(base, compute_dtype="bfloat16", use_flash=True,
                   dispatch="capacity", capacity_factor=1.0)
    variants = {
        "A_control_cf1": (fast, 32),
        "B_grouped": (replace(fast, dispatch="grouped"), 32),
        "C_grouped_pallas_conv": (replace(fast, dispatch="grouped", conv_impl="pallas"), 32),
        "D_pallas_conv": (replace(fast, conv_impl="pallas"), 32),
        "E_priority": (replace(fast, capacity_policy="priority"), 32),
        "F_grouped_b64": (replace(fast, dispatch="grouped"), 64),
    }
    results = {}
    only = os.environ.get("PERF_ONLY", "")
    for name, (cfg, batch) in variants.items():
        if only and name not in only.split(","):
            continue
        try:
            results[name] = measure(cfg, folded, batch)
            print(f"[{name}] {results[name]}", flush=True)
        except Exception as e:  # keep the sweep alive; record the failure
            results[name] = {"error": str(e)[:500]}
            print(f"[{name}] FAILED: {e}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
