"""Profile the flagship 35-NFE sampler on the real TPU chip.

VERDICT.md round-1 item 2: the 13.7 ms/denoiser-eval at batch 32 on a
32x32x4 model is suspected launch/overhead-bound; this job captures the
evidence: a jax.profiler trace of the compiled denoiser + sampler, the XLA
cost analysis (-> MFU estimate), and a per-op self-time breakdown parsed
from the xplane with tensorboard_plugin_profile.

Run on TPU (background; compiles take minutes):
    python scripts/profile_sampler.py [outdir]

Outputs under artifacts/profile_r2/:
    trace/...                  raw profiler trace (tensorboard-viewable)
    op_breakdown.json          top ops by self time
    summary.json               timings + FLOPs + MFU
"""

import json
import os
import sys
import time
from dataclasses import replace

# repo root importable without PYTHONPATH (setting PYTHONPATH breaks the
# axon TPU plugin's tunnel helper in this environment)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/profile_r2"
BATCH = int(os.environ.get("PROFILE_BATCH", "32"))
HEUN_STEPS = 18

# v5e peak: 197 TFLOP/s bf16, ~98.5 TFLOP/s fp32 (public spec)
PEAK_BF16 = 197e12


def log(*a):
    print(*a, flush=True)


def main():
    import contextlib
    import os

    os.makedirs(OUT, exist_ok=True)
    from hdmoe_tpu.models import default_model_config, precond_init, precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser
    from hdmoe_tpu.train.optim import project_mp_weights

    dev = jax.devices()[0]
    log("device:", dev)
    key = jax.random.PRNGKey(0)
    base_cfg = default_model_config()
    t0 = time.time()
    params = jax.jit(lambda k: precond_init(k, base_cfg))(key)
    jax.block_until_ready(params)
    log(f"init done in {time.time()-t0:.1f}s")
    text = jax.random.normal(key, (BATCH, 77, base_cfg.text_emb_dim))
    noise = jax.random.normal(
        key, (BATCH, base_cfg.img_resolution, base_cfg.img_resolution, base_cfg.in_channels)
    )

    # the current fast config: bf16 + cf1.0 + small-head flash; dispatch
    # and policy overridable (round 4: PROFILE_DISPATCH=einsum profiles the
    # one-hot-matmul movement fast path)
    cfg = replace(base_cfg, compute_dtype="bfloat16",
                  dispatch=os.environ.get("PROFILE_DISPATCH", "capacity"),
                  capacity_policy=os.environ.get("PROFILE_POLICY", "fcfs"),
                  capacity_factor=1.0, use_flash=True)
    fparams = project_mp_weights(params)

    def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
        return precond_apply(
            fparams, cfg, x, sigma, text_emb, m1, m2, zeta,
            transition_point=transition_point, softness=softness,
        )

    denoiser = make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)
    scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)
    sigma = jnp.full((BATCH, 1, 1, 1), 0.5)

    with mp_ops.prenormalized_weights():
        t0 = time.time()
        fwd = jax.jit(lambda x: denoiser(x, sigma, text)).lower(noise).compile()
        log(f"denoiser compile {time.time()-t0:.1f}s")
        t0 = time.time()
        sample = jax.jit(lambda n: edm_sample(denoiser, n, text, scfg)).lower(noise).compile()
        log(f"sampler compile {time.time()-t0:.1f}s")

    # ---- timings -------------------------------------------------------------
    jax.block_until_ready(fwd(noise))
    t0 = time.perf_counter()
    for _ in range(20):
        r = fwd(noise)
    jax.block_until_ready(r)
    eval_ms = (time.perf_counter() - t0) / 20 * 1e3
    log(f"denoiser eval: {eval_ms:.3f} ms")

    jax.block_until_ready(sample(noise))
    t0 = time.perf_counter()
    for _ in range(3):
        out = sample(noise)
    jax.block_until_ready(out)
    sample_s = (time.perf_counter() - t0) / 3
    log(f"sample wall: {sample_s:.4f} s -> {BATCH/sample_s:.1f} img/s")

    # ---- FLOPs / MFU -----------------------------------------------------------
    fwd_flops = None
    try:
        ca = fwd.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        fwd_flops = float(ca.get("flops", 0.0))
        log(f"denoiser flops (XLA estimate): {fwd_flops/1e9:.2f} GF")
    except Exception as e:
        log("cost_analysis failed:", e)
    mfu = None
    if fwd_flops:
        mfu = fwd_flops / (eval_ms / 1e3) / PEAK_BF16
        log(f"MFU vs bf16 peak: {mfu*100:.2f}%")

    # ---- trace -----------------------------------------------------------------
    tracedir = os.path.join(OUT, "trace")
    with jax.profiler.trace(tracedir):
        for _ in range(10):
            r = fwd(noise)
        jax.block_until_ready(r)
        out = sample(noise)
        jax.block_until_ready(out)
    log("trace written to", tracedir)

    # ---- parse xplane -> op breakdown -------------------------------------------
    breakdown = None
    try:
        import glob

        xplanes = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True)
        log("xplane files:", xplanes)
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {"tqx": "out:json"})
        if isinstance(data, bytes):
            data = data.decode()
        breakdown = json.loads(data) if isinstance(data, str) else data
        with open(os.path.join(OUT, "op_breakdown.json"), "w") as f:
            json.dump(breakdown, f)
        log("wrote op_breakdown.json")
    except Exception as e:
        log("xplane parse failed:", repr(e))
        # fall back: try op_profile tool
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
            with open(os.path.join(OUT, "op_profile.json"), "w") as f:
                f.write(data if isinstance(data, str) else data.decode())
            log("wrote op_profile.json")
        except Exception as e2:
            log("op_profile parse failed too:", repr(e2))

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(
            {
                "device": str(dev),
                "batch": BATCH,
                "denoiser_eval_ms": eval_ms,
                "sample_wall_s": sample_s,
                "images_per_sec": BATCH / sample_s,
                "denoiser_flops": fwd_flops,
                "mfu_bf16": mfu,
            },
            f,
            indent=1,
        )
    log("DONE")


if __name__ == "__main__":
    main()
