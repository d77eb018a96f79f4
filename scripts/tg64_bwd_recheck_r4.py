"""tg64 flash-vs-dense train-step regression recheck (VERDICT r3 item 5b).

Round-2e measured the text_guided_64 seq-4096 train step at batch 4 as
flash 41.2 ms vs dense 36.2 ms — the one result where flash loses to dense
at long sequence, attributed to backward grid overhead at d_head=4 and
never either fixed or formally refuted. Two things changed since: the
transposed attention pipeline became the default layout ("t"), whose
BACKWARD pays two explicit transposes around the fused kernel, and block
shapes were retuned. This script settles it with a 3-way A/B at batch 4
(where dense fits) plus flash at batch 16 (where dense OOMs):

  dense_b4      use_flash=False
  flash_t_b4    current default (transposed pipeline fwd, transposed bwd)
  flash_std_b4  attn_layout("std"): round-2e's exact path, current kernels
  flash_t_b16 / flash_std_b16   the memory-win regime sanity row

Method: compiled train-step walls, 10-step timing loop, value-fetch
barrier on the loss (PERF.md tunnel caveat).

Usage: python scripts/tg64_bwd_recheck_r4.py [out_json]
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/tg64_bwd_recheck_r4.json"


def main():
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.ops.attention import attn_layout
    from hdmoe_tpu.train.presets import text_guided_64
    from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
    from hdmoe_tpu.train.train_step import (TrainConfig, init_train_state,
                                            make_train_step)

    print("device:", jax.devices()[0], flush=True)
    model, optim, loss, mask, _run = text_guided_64()
    umask = MaskGenerator(expert_attributes=tuple(mask["unet_attr"]),
                          p_mean=-1.2, p_std=1.6)
    vmask = MaskGenerator(expert_attributes=tuple(mask["vit_attr"]),
                          p_mean=-1.2, p_std=1.6)
    zeta = ZetaSchedule(total_steps=5000, max_zeta=2.0, min_zeta=0.01)

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    arms = [
        ("dense_b4", replace(model, use_flash=False), 4, "t"),
        ("flash_t_b4", model, 4, "t"),
        ("flash_std_b4", model, 4, "std"),
        ("flash_t_b16", model, 16, "t"),
        ("flash_std_b16", model, 16, "std"),
    ]
    for tag, cfg, b, layout in arms:
        if tag in results:
            print(f"[{tag}] already recorded, skipping", flush=True)
            continue
        params = jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0))
        state = init_train_state(params, optim)
        # the layout must ride TrainConfig: since the round-4 fix,
        # _make_grads_fn re-enters attn_layout(train_cfg.attn_layout) inside
        # the trace, which would override any outer context manager (the
        # committed artifact numbers were measured pre-pin and are what
        # motivated the pin; reruns go through this field)
        step = make_train_step(cfg, loss, optim,
                               TrainConfig(p_mean=-1.2, p_std=1.6,
                                           attn_layout=layout),
                               umask, vmask, zeta)
        latents = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 3)) * 0.5
        txt = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768))
        t0 = time.time()
        try:
            with attn_layout(layout):
                compiled = jax.jit(step).lower(
                    state, latents, txt, jax.random.PRNGKey(3)).compile()
        except Exception as e:
            results[tag] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[{tag}] FAILED: {results[tag]}", flush=True)
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
            continue
        compile_s = time.time() - t0
        r = compiled(state, latents, txt, jax.random.PRNGKey(3))
        float(r[1]["loss"])  # value-fetch barrier
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            r = compiled(state, latents, txt, jax.random.PRNGKey(3))
        float(r[1]["loss"])
        ms = (time.perf_counter() - t0) / n * 1e3
        results[tag] = {"step_ms": round(ms, 2),
                        "samples_per_s": round(b / ms * 1e3, 1),
                        "compile_s": round(compile_s, 1)}
        print(f"[{tag}] {results[tag]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
