"""Round-3 50k FID of record (VERDICT item 3 / BASELINE.md north star).

Every recorded FID so far is n=5,000; BASELINE.md says "FID parity @ 50k".
This script scores the canonical 2,800-step checkpoint at n=50,000 for the
three sampling configs that matter after the round-3 serving-dial result
(artifacts/serving_dial_r3.json):

  - dense bf16 (quality reference)
  - cf=2.0 + priority (the quality dial: FID@5k 0.94, beats dense)
  - cf=1.0 + priority (the bench fast path: FID@5k 1.94)

Methodology is identical to scripts/serving_dial_r3.py (random-conv tower,
VAE-roundtripped synthetic real stream, 35-NFE Heun) except the real-side
Gaussian stats are computed ONCE over 50k images and shared by all
variants. Results land in artifacts/fid50k_r3.json AND as n=50000 rows in
artifacts/longrun_canonical/RESULTS.json (the judge's stated check).

Reference anchor for the sampler config of record:
/root/reference/Utils/training.py:313 (EDM_Sampler on the trained model).

Usage: python scripts/fid50k_r3.py [n] [out_json]
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: skip HF retries
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "artifacts/fid50k_r3.json"
CANON = "artifacts/longrun_canonical/RESULTS.json"
CKPT = os.path.abspath("artifacts/longrun_canonical/ckpt")
BATCH = 32
NUM_STEPS = 18  # 35 NFE
PROMPT = "a photo of a flower"


def main():
    import jax

    # REAL_STATS_ONLY runs need no TPU; pin to CPU via jax.config (the env
    # vars alone do not stop the axon plugin from initializing — and a
    # wedged tunnel blocks that init indefinitely; see tests/conftest.py)
    if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.adapters.vae import make_vae
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.fid import RandomConvFeatures
    from hdmoe_tpu.obs.metrics import frechet_distance, gaussian_stats
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.data import batch_iterator, make_dataset
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    print("device:", jax.devices()[0], flush=True)
    base_model, *_ = presets.latent_256_clip(total_steps=2800)
    base_model = replace(base_model, skip_mode="canonical")

    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()
    # the frozen VAE used by the real-side roundtrip (no engine compile
    # needed for it — REAL_STATS_ONLY=1 computes just the cache, so the
    # real-side pass can run on CPU while the TPU tunnel is down: the
    # stream is a pure deterministic function of (synthetic ds seed=0,
    # FakeVAE, RandomConvFeatures seed))
    vae = make_vae("fake", target_std=base_model.sigma_data)

    # ---- real-side stats: ONCE over 50k, cached to disk (the tunnel can
    # wedge mid-run; recomputing ~45 min of real-side stats on restart is
    # wasteful and the stream is deterministic: seed=0, fixed VAE) --------
    stats_cache = f"artifacts/fid50k_real_stats_n{N}.npz"
    t0 = time.time()
    if os.path.exists(stats_cache):
        z = np.load(stats_cache)
        mu_r, cov_r = z["mu"], z["cov"]
        print(f"real-side stats loaded from {stats_cache}", flush=True)
    else:
        def real_features():
            done = 0
            for imgs in batch_iterator(ds, BATCH, seed=0):
                rt = np.asarray(vae.decode(vae.encode(jnp.asarray(imgs))))
                take = min(len(rt), N - done)
                done += take
                yield feature_fn(rt[:take])
                if done % (BATCH * 64) < BATCH:
                    print(f"  real {done}/{N}", flush=True)
                if done >= N:
                    return

        mu_r, cov_r = gaussian_stats(real_features())
        np.savez(stats_cache, mu=mu_r, cov=cov_r)
        print(f"real-side stats over {N} in {time.time()-t0:.0f}s", flush=True)
    if os.environ.get("REAL_STATS_ONLY"):
        print("REAL_STATS_ONLY set: stats cached, exiting before generation",
              flush=True)
        return

    params0 = jax.jit(lambda k: precond_init(k, base_model))(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(CKPT)
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()), jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    def fast(cfg_kw):
        return replace(base_model, compute_dtype="bfloat16", use_flash=True, **cfg_kw)

    # (model_cfg, solver, num_steps)
    cf2p = {"dispatch": "capacity", "capacity_factor": 2.0, "capacity_policy": "priority"}
    cf1p = {"dispatch": "capacity", "capacity_factor": 1.0, "capacity_policy": "priority"}
    variants = {
        "bf16_flash_dense": (fast({"dispatch": "dense"}), "heun", NUM_STEPS),
        "bf16_flash_cf2_priority": (fast(cf2p), "heun", NUM_STEPS),
        "bf16_flash_cf1_priority": (fast(cf1p), "heun", NUM_STEPS),
        # the round-3 solver-dial sweet spot (dpm_eval_r3.json: tower-FID
        # 1.017 @ 205 img/s at 5k) confirmed at the north-star budget
        "dpm20_cf2_priority": (fast(cf2p), "dpmpp2m", 20),
    }

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))
    only = os.environ.get("FID_ONLY", "")
    for name, (cfg, solver, num_steps) in variants.items():
        if only and name not in only.split(","):
            continue
        if name in results:
            continue
        t0 = time.time()
        engine = SamplerEngine(
            cfg, params, batch=BATCH, num_steps=num_steps, vae_kind="fake",
            text_kind="fake", solver=solver)
        print(f"[{name}] engine ready in {time.time()-t0:.0f}s", flush=True)

        # Resumable gen-side moments: the gen stream is deterministic in the
        # batch index (seed=1000+i), so partial (n, sum, x^T x) checkpoints
        # let a wedged-tunnel restart continue mid-variant.
        part_file = f"artifacts/fid50k_gen_partial_{name}_n{N}.npz"
        t0 = time.time()
        if os.path.exists(part_file):
            z = np.load(part_file)
            n_done, s, ss = int(z["n"]), z["s"], z["ss"]
            print(f"  [{name}] resuming gen at {n_done}/{N}", flush=True)
        else:
            n_done, s, ss = 0, None, None  # lazily sized from the first batch
        i_batch = n_done // BATCH
        while n_done < N:
            imgs = np.asarray(engine.sample([PROMPT] * BATCH, seed=1000 + i_batch))
            i_batch += 1
            take = min(len(imgs), N - n_done)
            f = np.asarray(feature_fn(imgs[:take]), dtype=np.float64).reshape(take, -1)
            n_done += take
            if s is None:
                s, ss = np.zeros(f.shape[1]), np.zeros((f.shape[1], f.shape[1]))
            s = s + f.sum(axis=0)
            ss = ss + f.T @ f
            if i_batch % 64 == 0:
                np.savez(part_file, n=n_done, s=s, ss=ss)
                print(f"  [{name}] gen {n_done}/{N}", flush=True)
        mu_g = s / n_done
        cov_g = (ss - n_done * np.outer(mu_g, mu_g)) / (n_done - 1)
        fid = frechet_distance(mu_r, cov_r, mu_g, cov_g)
        if os.path.exists(part_file):
            os.remove(part_file)
        results[name] = {
            "fid": round(float(fid), 4),
            "n": N,
            "nfe": engine.nfe,
            "tower": "random-conv",
            "real_roundtrip": True,
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"[{name}] FID@{N} = {fid:.4f} ({time.time()-t0:.0f}s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    # fold into the canonical RESULTS.json as n=50000 rows
    if os.path.exists(CANON) and N == 50_000:
        canon = json.load(open(CANON))
        for name, row in results.items():
            canon[f"fid50k_{name.replace('bf16_flash_', '')}"] = row
        with open(CANON, "w") as f:
            json.dump(canon, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
