"""50k FID of record for the b128+LRx2 seed-7 checkpoint (VERDICT r4 item 4).

fid50k_r3.json scored the OLD canonical checkpoint; round 4 retracted its
dial conclusions and trained a stronger recipe-of-record checkpoint
(dense FID@5k 0.2857, artifacts/dial_second_ckpt_r4). This re-validates at
n=50,000 with the same methodology (random-conv tower, VAE-roundtripped
real stream, shared real-side stats cache):

  - bf16_flash_dense           : quality anchor (lockstep, 35 NFE)
  - stag_profile_b512          : the round-5 staggered + load-profiled
                                 per-expert-capacity dial (36 NFE/img;
                                 hdmoe_tpu/sampler/staggered.py) — FID@5k
                                 0.2832 vs dense 0.2857 at 226 img/s
  - stag_dpm20_profile_b512    : the same dial on DPM++(2M)-20 (20 NFE/img)
                                 if its 5k FID holds up
  - dpm20_dense                : the round-3 solver quality dial
                                 (dpm_eval_r3: beat heun18 on both axes)

Usage: python scripts/fid50k_r5.py [n] [out_json]
Writes artifacts/fid50k_r5.json (incremental per-arm; dense/dpm arms are
batch-resumable like fid50k_r3).
"""

import json
import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "artifacts/fid50k_r5.json"
CKPT = os.path.abspath("artifacts/dial_second_ckpt_r4/ckpt_seed7")
BATCH = 32
NUM_STEPS = 18
PROMPT = "a photo of a flower"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.compilecache import enable_persistent_cache
    from hdmoe_tpu.adapters.vae import make_vae
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.fid import RandomConvFeatures
    from hdmoe_tpu.obs.metrics import frechet_distance, gaussian_stats
    from hdmoe_tpu.sampler.staggered import StaggeredEngine
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.data import batch_iterator, make_dataset
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    enable_persistent_cache()
    print("device:", jax.devices()[0], flush=True)
    base_model, *_ = presets.latent_256_clip(total_steps=1248)
    base_model = replace(base_model, skip_mode="canonical")

    ds = make_dataset("synthetic", resolution=256, seed=0)
    feature_fn = RandomConvFeatures()
    vae = make_vae("fake", target_std=base_model.sigma_data)

    # Real-side stats: the stream is deterministic (synthetic seed=0,
    # FakeVAE, seeded tower) and checkpoint-independent — REUSE the round-3
    # cache when present.
    stats_cache = f"artifacts/fid50k_real_stats_n{N}.npz"
    if os.path.exists(stats_cache):
        z = np.load(stats_cache)
        mu_r, cov_r = z["mu"], z["cov"]
        print(f"real-side stats loaded from {stats_cache}", flush=True)
    else:
        t0 = time.time()

        def real_features():
            done = 0
            for imgs in batch_iterator(ds, BATCH, seed=0):
                rt = np.asarray(vae.decode(vae.encode(jnp.asarray(imgs))))
                take = min(len(rt), N - done)
                done += take
                yield feature_fn(rt[:take])
                if done >= N:
                    return

        mu_r, cov_r = gaussian_stats(real_features())
        np.savez(stats_cache, mu=mu_r, cov=cov_r)
        print(f"real-side stats over {N} in {time.time()-t0:.0f}s", flush=True)

    params0 = jax.jit(lambda k: precond_init(k, base_model))(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(CKPT)
    state, _, _ = ckpt.restore(init_train_state(params0, OptimConfig()),
                               jax.random.PRNGKey(0))
    params = state.params
    ckpt.close()

    def fast(cfg_kw):
        return replace(base_model, compute_dtype="bfloat16", use_flash=True, **cfg_kw)

    results = {}
    if os.path.exists(OUT):
        results.update(json.load(open(OUT)))

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def score_stream(name, next_batch, nfe):
        """Accumulate gen-side moments over N images from next_batch()."""
        t0 = time.time()
        n_done, s, ss = 0, None, None
        while n_done < N:
            imgs = next_batch()
            take = min(len(imgs), N - n_done)
            f = np.asarray(feature_fn(imgs[:take]), dtype=np.float64).reshape(take, -1)
            n_done += take
            if s is None:
                s = np.zeros(f.shape[1])
                ss = np.zeros((f.shape[1], f.shape[1]))
            s += f.sum(axis=0)
            ss += f.T @ f
            if n_done % (BATCH * 256) < BATCH:
                print(f"  [{name}] gen {n_done}/{N} ({time.time()-t0:.0f}s)",
                      flush=True)
        mu_g = s / n_done
        cov_g = (ss - n_done * np.outer(mu_g, mu_g)) / (n_done - 1)
        fid = frechet_distance(mu_r, cov_r, mu_g, cov_g)
        results[name] = {
            "fid": round(float(fid), 4), "n": N, "nfe": nfe,
            "tower": "random-conv", "tower_fingerprint": feature_fn.fingerprint(),
            "real_roundtrip": True, "checkpoint": "seed7_b128_lrx2",
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"[{name}] FID@{N} = {fid:.4f} ({time.time()-t0:.0f}s)", flush=True)
        save()

    # --- lockstep arms (dense anchor + dpm20 quality dial) -----------------
    for name, cfg, solver, steps in (
        ("bf16_flash_dense", fast({"dispatch": "dense"}), "heun", NUM_STEPS),
        ("dpm20_dense", fast({"dispatch": "dense"}), "dpmpp2m", 20),
    ):
        if name in results:
            print(f"[{name}] cached", flush=True)
            continue
        t0 = time.time()
        engine = SamplerEngine(cfg, params, batch=BATCH, num_steps=steps,
                               vae_kind="fake", text_kind="fake", solver=solver)
        print(f"[{name}] engine ready in {time.time()-t0:.0f}s", flush=True)
        counter = iter(range(1 << 40))

        def next_batch(e=engine):
            return np.asarray(e.sample([PROMPT] * BATCH, seed=1000 + next(counter)))

        score_stream(name, next_batch, engine.nfe)

    # --- staggered no-drop dials at the bench batch -------------------------
    prof = {"dispatch": "einsum", "capacity_policy": "priority",
            "capacity_profile_unet": (0.40, 0.03, 0.20, 0.62),
            "capacity_profile_vit": (0.47, 0.08, 0.33, 0.35)}
    stag_arms = [("stag_profile_b512", "heun", NUM_STEPS)]
    if os.environ.get("FID50K_DPM_STAG"):
        stag_arms.append(("stag_dpm20_profile_b512", "dpmpp2m", 20))
    for name, solver, steps in stag_arms:
        if name in results:
            print(f"[{name}] cached", flush=True)
            continue
        cfg = fast(prof)
        t0 = time.time()
        eng = StaggeredEngine(cfg, params, batch=512, num_steps=steps,
                              vae_kind="fake", text_kind="fake", solver=solver)
        eng.set_prompts([PROMPT], seed=1000)
        print(f"[{name}] engine built in {time.time()-t0:.0f}s", flush=True)

        def next_batch(e=eng):
            return np.asarray(e.vae.decode(e.sample_round()))

        score_stream(name, next_batch, eng.nfe_per_image)

    print("DONE", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
