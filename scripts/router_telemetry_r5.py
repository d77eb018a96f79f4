"""Router telemetry across the sampling sigma schedule (VERDICT r4 item 2).

Question: WHY do capacity drops cost 11x FID on the strong b128+LRx2
checkpoint (dense 0.286 -> cf1-priority 3.17)? Hypothesis: the routers are
noise-conditioned; in LOCKSTEP sampling every image in the batch shares one
sigma per step, so per-step routing concentrates the whole batch onto one
expert — capacity cf1 provisions B/E slots, so most routed samples are
dropped or rerouted to a wrong expert exactly where the checkpoint is most
specialized. Training never sees this (per-sample random sigmas).

Measures, per Heun step of the dense trajectory (checkpoint of record):
  - top-1 expert load histogram for the U-Net and ViT routers;
  - max-load fraction (1/E = balanced, 1.0 = total collapse);
  - fraction of samples DROPPED at cf=1 / cf=2 under FCFS capacity;
  - after the priority reroute pre-pass (moe.reroute_overflow): fraction
    still dropped + fraction served by a NON-first-choice expert.
And the counterfactual: the same router evaluated on a MIXED-SIGMA batch
(slots spread uniformly over the schedule, exactly the staggered sampler's
steady state) — per-call load flattens toward B/E and drops vanish.

Usage: python scripts/router_telemetry_r5.py [batch] [ckpt_dir] [out_json]
Writes artifacts/router_telemetry_r5.json (default: seed-7 checkpoint).
"""

import json
import os
import sys
from dataclasses import replace
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CKPT = os.path.abspath(sys.argv[2] if len(sys.argv) > 2
                       else "artifacts/dial_second_ckpt_r4/ckpt_seed7")
OUT = sys.argv[3] if len(sys.argv) > 3 else "artifacts/router_telemetry_r5.json"
NUM_STEPS = 18
PROMPT = "a photo of a flower"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.compilecache import enable_persistent_cache
    from hdmoe_tpu.adapters import make_text_encoder
    from hdmoe_tpu.models import precond_apply, precond_init
    from hdmoe_tpu.models import moe
    from hdmoe_tpu.sampler.edm import EDMSamplerConfig, karras_sigma_schedule
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    enable_persistent_cache()
    print("device:", jax.devices()[0], flush=True)

    model, *_ = presets.latent_256_clip(total_steps=100)
    model = replace(model, skip_mode="canonical", compute_dtype="bfloat16",
                    use_flash=True, dispatch="dense")
    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    cm = CheckpointManager(CKPT)
    state, _, _ = cm.restore(init_train_state(params0, OptimConfig()),
                             jax.random.PRNGKey(0))
    params = state.params
    cm.close()
    E = model.num_experts

    scfg = EDMSamplerConfig(num_steps=NUM_STEPS)
    t_steps = np.asarray(karras_sigma_schedule(scfg))

    clip = make_text_encoder("fake", width=model.text_emb_dim)
    text = clip.encode_text([PROMPT] * BATCH)

    @jax.jit
    def eval_step(x, sigma):
        ones = jnp.ones((x.shape[0], E), jnp.float32)
        out = precond_apply(params, model, x, sigma, text, ones, ones, 0.0,
                            transition_point=-1.2, softness=1.6)
        return out["denoised"], out["Unet_router_loss"], out["vit_router_loss"]

    def stats(probs, cf):
        """Per-call stats for one router at one capacity factor."""
        b = probs.shape[0]
        cap = max(1, min(b, int(np.ceil(cf * b / E))))
        top1 = np.argmax(probs, axis=1)
        loads = np.bincount(top1, minlength=E)
        dropped_fcfs = int(np.maximum(loads - cap, 0).sum())
        # priority reroute pre-pass on the top-1 sparse gate matrix
        w = np.zeros((b, E), np.float32)
        w[np.arange(b), top1] = probs[np.arange(b), top1]
        new_w = np.asarray(moe.reroute_overflow(jnp.asarray(w),
                                                jnp.asarray(probs), cap))
        served = (new_w > 0).any(axis=1)
        first_choice = new_w[np.arange(b), top1] > 0
        return {
            "capacity": cap,
            "loads": loads.tolist(),
            "max_load_frac": round(float(loads.max()) / b, 4),
            "drop_frac_fcfs": round(dropped_fcfs / b, 4),
            "drop_frac_priority": round(float((~served).sum()) / b, 4),
            "wrong_expert_frac_priority": round(
                float((served & ~first_choice).sum()) / b, 4),
        }

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (BATCH, model.img_resolution, model.img_resolution,
                                model.in_channels)) * float(t_steps[0])
    per_step = []
    xs_by_step = []  # lockstep states for the mixed-sigma counterfactual
    for i in range(NUM_STEPS):
        t_cur, t_next = float(t_steps[i]), float(t_steps[i + 1])
        xs_by_step.append(np.asarray(x))
        denoised, up, vp = eval_step(x, jnp.full((1, 1, 1, 1), t_cur))
        up, vp = np.asarray(up, np.float32), np.asarray(vp, np.float32)
        d = (x - denoised) / t_cur
        x_e = x + (t_next - t_cur) * d
        if i < NUM_STEPS - 1:
            den_p, _, _ = eval_step(x_e, jnp.full((1, 1, 1, 1), t_next))
            x = x + (t_next - t_cur) * (0.5 * d + 0.5 * (x_e - den_p) / t_next)
        else:
            x = x_e
        row = {"step": i, "sigma": round(t_cur, 4)}
        for name, p in (("unet", up), ("vit", vp)):
            row[name] = {f"cf{cf}": stats(p, cf) for cf in (1.0, 2.0)}
            row[name]["entropy"] = round(float(
                -(p * np.log(np.clip(p, 1e-9, 1))).sum(axis=1).mean()), 4)
        per_step.append(row)
        print(f"[lockstep step {i:2d}] sigma={t_cur:8.3f} "
              f"unet loads={row['unet']['cf1.0']['loads']} "
              f"drop_fcfs={row['unet']['cf1.0']['drop_frac_fcfs']:.2f} "
              f"drop_prio={row['unet']['cf1.0']['drop_frac_priority']:.2f} "
              f"wrong={row['unet']['cf1.0']['wrong_expert_frac_priority']:.2f}",
              flush=True)

    # Mixed-sigma counterfactual: slot i at step (i*n)//B — the staggered
    # sampler's steady state, built from the SAME trajectory states.
    sidx = (np.arange(BATCH) * NUM_STEPS) // BATCH
    x_mix = jnp.asarray(np.stack([xs_by_step[s][j] for j, s in enumerate(sidx)]))
    sig_mix = jnp.asarray(t_steps[sidx], jnp.float32).reshape(-1, 1, 1, 1)
    _, up, vp = eval_step(x_mix, sig_mix)
    mixed = {}
    for name, p in (("unet", np.asarray(up, np.float32)),
                    ("vit", np.asarray(vp, np.float32))):
        mixed[name] = {f"cf{cf}": stats(p, cf) for cf in (1.0, 1.25, 2.0)}
    print("[mixed-sigma] unet cf1:", mixed["unet"]["cf1.0"], flush=True)
    print("[mixed-sigma] vit  cf1:", mixed["vit"]["cf1.0"], flush=True)

    summary = {
        "lockstep_mean_drop_frac_priority_cf1_unet": round(float(np.mean(
            [r["unet"]["cf1.0"]["drop_frac_priority"] for r in per_step])), 4),
        "lockstep_mean_wrong_expert_cf1_unet": round(float(np.mean(
            [r["unet"]["cf1.0"]["wrong_expert_frac_priority"] for r in per_step])), 4),
        "lockstep_mean_max_load_frac_unet": round(float(np.mean(
            [r["unet"]["cf1.0"]["max_load_frac"] for r in per_step])), 4),
        "mixed_sigma": mixed,
    }
    out = {"checkpoint": CKPT, "batch": BATCH, "num_steps": NUM_STEPS,
           "num_experts": E, "summary": summary, "per_step": per_step}
    os.makedirs("artifacts", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("SUMMARY", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
