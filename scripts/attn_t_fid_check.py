"""FID@5k spot check for the transposed attention pipeline.

The transposed path (attn_layout "t") is float-identical math modulo
contraction-order reassociation (pinned to 3e-5 in tests); this confirms
the serving-dial FID is unchanged end to end on the canonical checkpoint,
headline dial (heun18 + cf=1.0 priority), same methodology as
serving_dial_r3.py. Writes artifacts/attn_t_fid_check.json.
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FID = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
OUT = "artifacts/attn_t_fid_check.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
BATCH = 32
NUM_STEPS = 18
PROMPT = "a photo of a flower"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.fid import RandomConvFeatures, fid_evaluate
    from hdmoe_tpu.ops.attention import attn_layout
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.data import batch_iterator, make_dataset
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    print("device:", jax.devices()[0], flush=True)
    base_model, *_ = presets.latent_256_clip(total_steps=2800)
    base_model = replace(base_model, skip_mode="canonical")

    params0 = jax.jit(lambda k: precond_init(k, base_model))(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(CKPT)
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()), jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()
    cfg = replace(base_model, compute_dtype="bfloat16", use_flash=True,
                  dispatch="capacity", capacity_factor=1.0,
                  capacity_policy="priority")

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    for layout in ("t", "std"):
        name = f"cf1_priority_{layout}"
        if name in results:
            continue
        t0 = time.time()
        with attn_layout(layout):
            engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=NUM_STEPS,
                                   vae_kind="fake", text_kind="fake")
        print(f"[{name}] engine compiled in {time.time()-t0:.0f}s", flush=True)

        counter = iter(range(1 << 62))

        def sample_fn(n_req):
            return engine.sample([PROMPT] * n_req, seed=1000 + next(counter))

        def real_stream():
            for imgs in batch_iterator(ds, BATCH, seed=0):
                yield np.asarray(engine.vae.decode(engine.vae.encode(jnp.asarray(imgs))))

        t0 = time.time()
        fid = fid_evaluate(sample_fn, real_stream(), feature_fn, n=N_FID, batch=BATCH)
        results[name] = {"fid": round(float(fid), 4), "n": N_FID, "nfe": 2 * NUM_STEPS - 1,
                         "tower": "random-conv", "real_roundtrip": True}
        print(f"[{name}] FID@{N_FID} {fid:.4f} (wall {time.time()-t0:.0f}s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
