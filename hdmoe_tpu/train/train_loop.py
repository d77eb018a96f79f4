"""End-to-end training entry: the TPU-native ``training_HDMOE``.

Re-design of reference Utils/training.py:14-223. The same pipeline —
data -> frozen VAE encode -> hybrid sigma draw -> noising -> zeta/mask
schedules -> HDMOEM forward -> EDM loss -> multi-group AdamW -> telemetry ->
checkpoints — but arranged TPU-first:

- the whole optimizer step is ONE jitted (optionally pjit-sharded) program
  (train_step.py); the host loop only feeds batches and drains telemetry.
- the fixed-prompt CLIP embedding is computed ONCE and reused (the reference
  re-encodes the same prompt every step, training.py:143).
- frozen VAE encode is a jitted inference graph on device.
- checkpointing is orbax save/RESUME (the reference cannot resume).

Reference bugs fixed, not copied (SURVEY.md §7): the ``model.net.routers``
optimizer group AttributeError and the silently-untrained parameter groups
(see train/optim.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from hdmoe_tpu.adapters import make_text_encoder, make_vae
from hdmoe_tpu.train.augment import AugmentConfig, augment_batch
from hdmoe_tpu.models.configs import HDMOEMConfig
from hdmoe_tpu.models.hdmoem import precond_init
from hdmoe_tpu.obs.logger import Logger
from hdmoe_tpu.obs.profiling import StepTimer
from hdmoe_tpu.parallel import MeshConfig, make_mesh, make_sharded_train_step, shard_train_state
from hdmoe_tpu.train.checkpoint import CheckpointManager
from hdmoe_tpu.train.data import batch_iterator, make_dataset, prefetch_to_device
from hdmoe_tpu.train.loss import EDMLossConfig
from hdmoe_tpu.train.optim import OptimConfig, current_lrs
from hdmoe_tpu.train.schedulers import MaskGenerator, ZetaSchedule
from hdmoe_tpu.train.train_step import TrainConfig, init_train_state, make_train_step


@dataclass
class RunConfig:
    """Host-level run settings (reference model_configs keys not owned by the
    model itself: Utils/configs.py:4-34)."""

    save_dir: str = "./checkpoints/run"
    log_dir: str = "./logs"
    run_name: str = "hdmoem_run"
    batch_size: int = 32
    total_steps: int = 5000
    save_interval: int = 1000
    log_interval: int = 10
    data_img_res: int = 256
    # synthetic | synthetic-native (C++ host gen) | synthetic-device
    # (generated INSIDE the jitted step — zero H2D) | flowers102 | cifar10
    # | imagefolder
    dataset: str = "synthetic"
    data_root: str = "./data"
    fixed_prompt: str = "a photo of a flower"
    vae: str = "fake"  # fake | real | auto
    text_encoder: str = "fake"
    seed: int = 0
    resume: bool = False
    mesh: Optional[MeshConfig] = None  # None => single device
    # ZeRO/FSDP: store params + Adam moments sharded 1/data-sized per chip
    # (parallel/sharding.py:_extend_fsdp); GSPMD all-gathers weights at use
    # and reduce-scatters grads into the shard. Memory lever for models too
    # big to replicate — needs run.mesh with data > 1.
    fsdp: bool = False
    fsdp_min_size: int = 1024  # leaves under this many elements replicate
    print_interval: int = 100
    ema_decay: float = 0.0  # 0 disables EMA; e.g. 0.9999 enables
    # Post-hoc EMA (Karras/EDM2; the reference's open TODO): snapshot the
    # two tracked power-profile averages every N steps; training ends by
    # writing <save_dir>_posthoc.npz, from which train.ema.posthoc_ema
    # synthesizes the EMA of ANY averaging length. 0 disables.
    ema_posthoc_every: int = 0
    # Fetch telemetry from device every N steps (1 = reference-faithful
    # per-step accumulation; log_interval-aligned values avoid the per-step
    # device->host roundtrip that dominates small-model training throughput).
    telemetry_every: int = 1
    # Device-side multi-step loop (train_step.make_train_multistep): the
    # host stacks K batches into one (K, B, ...) transfer and ONE dispatch
    # runs K optimizer steps — amortizes per-step dispatch/transfer latency,
    # which round-3 measured as the actual full-loop bottleneck
    # (artifacts/feed_throughput_r3.json). Telemetry/checkpoint granularity
    # becomes K steps. Host-fed mesh runs keep 1 (dataset="synthetic-device"
    # supports K>1 on a mesh — generation happens in-program).
    steps_per_call: int = 1
    # On-device data augmentation (reference README TODO 3), applied to the
    # pixel batch INSIDE the compiled program right before the frozen-VAE
    # encode (train/augment.py). None = off (reference-faithful stream:
    # enabling augmentation re-splits the encode key).
    augment: Optional["AugmentConfig"] = None
    # Gradient accumulation (train_step.make_train_step_accum): each
    # optimizer step averages gradients over this many microbatches of
    # ``batch_size`` — effective batch ``grad_accum * batch_size`` with one
    # microbatch's memory. Mutually exclusive with steps_per_call > 1 and
    # dataset="synthetic-device" (those amortize dispatch, this amortizes
    # memory; composing them has no use case worth the lattice math).
    grad_accum: int = 1
    # Async checkpointing: save() blocks only on the device->host transfer
    # and streams to disk in a background thread, overlapping the write with
    # the next save_interval of training. At most one write is in flight;
    # restore/close synchronize with it (train/checkpoint.py).
    async_checkpoint: bool = True
    # In-training sample-quality evaluation (train/evalhook.py): every N
    # steps, swap the live (EMA when tracked) weights into one lazily
    # AOT-compiled small-batch sampler, stream eval_n images through the
    # FID harness vs the training dataset, write a grid PNG + an eval-stream
    # JSONL record. 0 = off. A trend probe (random-conv tower, small n) —
    # the 50k harness stays the number of record.
    eval_interval: int = 0
    eval_n: int = 64
    eval_num_steps: int = 18
    eval_solver: str = "heun"
    eval_use_ema: bool = True


def training_hdmoe(
    model_cfg: HDMOEMConfig,
    optim_cfg: OptimConfig,
    loss_cfg: EDMLossConfig,
    mask_cfg: Dict[str, Any],
    zeta_cfg: Dict[str, Any],
    run_cfg: Optional[RunConfig] = None,
) -> Dict[str, float]:
    """Train HDMOEM end-to-end; returns final metrics.

    Signature mirrors the reference entry
    ``training_HDMOE(model_config, Optim_config, loss_config, mask_config,
    zeta_config)`` (training.py:14-19) with dataclass/dict configs.
    """
    run = run_cfg or RunConfig()
    key = jax.random.PRNGKey(run.seed)

    # ---- data + frozen encoders -------------------------------------------
    dataset = make_dataset(run.dataset, resolution=run.data_img_res, root=run.data_root, seed=run.seed)
    vae = make_vae(run.vae, target_std=model_cfg.sigma_data)
    clip = make_text_encoder(run.text_encoder, width=model_cfg.text_emb_dim)
    aug = run.augment if (run.augment is not None and run.augment.enabled) else None

    def _encode(px, k):
        if aug is not None:  # augment-then-encode inside one compiled program
            ka, ke = jax.random.split(k)
            return vae.encode(augment_batch(ka, px, aug), ke)
        return vae.encode(px, k)  # aug off: bit-identical to pre-augment runs

    encode = jax.jit(_encode) if hasattr(vae, "_proj") else _encode

    # Fixed prompt embedding: computed once, reused every step.
    text_emb = None
    if model_cfg.text_emb_dim > 0:
        text_emb = clip.encode_text([run.fixed_prompt] * run.batch_size)

    # ---- schedules ---------------------------------------------------------
    unet_mask_gen = MaskGenerator(
        expert_attributes=tuple(mask_cfg["unet_attr"]),
        p_mean=mask_cfg["p_mean"], p_std=mask_cfg["p_std"],
        bandwidth=mask_cfg["BW"], max_bandwidth=mask_cfg["max_BW"],
        min_active=mask_cfg["min_active"], total_steps=run.total_steps,
        step_size=mask_cfg["step_size"], noise_range=tuple(mask_cfg["unet_noise_range"]),
        strat_band=mask_cfg["strat_band"],
    )
    vit_mask_gen = MaskGenerator(
        expert_attributes=tuple(mask_cfg["vit_attr"]),
        p_mean=mask_cfg["p_mean"], p_std=mask_cfg["p_std"],
        bandwidth=mask_cfg["BW"], max_bandwidth=mask_cfg["max_BW"],
        min_active=mask_cfg["min_active"], total_steps=run.total_steps,
        step_size=mask_cfg["step_size"], noise_range=tuple(mask_cfg["vit_noise_range"]),
        strat_band=mask_cfg["strat_band"],
    )
    zeta_sched = ZetaSchedule(
        total_steps=zeta_cfg["total_schedule_steps"], max_zeta=zeta_cfg["max_zeta"],
        min_zeta=zeta_cfg["min_zeta"], strategy=zeta_cfg["strategy"],
        warmup_ratio=zeta_cfg["warmup_ratio"], alpha=zeta_cfg.get("alpha", 4.0),
    )
    train_cfg = TrainConfig(p_mean=mask_cfg["p_mean"], p_std=mask_cfg["p_std"],
                            transition_point=mask_cfg["p_mean"], softness=mask_cfg["p_std"])

    # ---- model + optimizer -------------------------------------------------
    key, k_init = jax.random.split(key)
    params = jax.jit(lambda k: precond_init(k, model_cfg))(k_init)
    state = init_train_state(params, optim_cfg)

    ckpt = CheckpointManager(run.save_dir, async_save=run.async_checkpoint)

    data_target = None  # where host batches land (single device or mesh-sharded)
    import contextlib

    trace_ctx = contextlib.ExitStack()  # mesh contexts live through tracing
    mesh = None
    if run.mesh is not None:
        from hdmoe_tpu.parallel.sharding import batch_sharding

        mesh = make_mesh(run.mesh)
        # config-driven mesh contexts: explicit all-to-all EP dispatch and
        # ring (sequence-parallel) attention read these at trace time.
        if getattr(model_cfg, "ep_all_to_all", False):
            from hdmoe_tpu.parallel.ep import ep_context

            trace_ctx.enter_context(ep_context(mesh))
        if model_cfg.attn_impl == "ring":
            from hdmoe_tpu.ops.attention import ring_attention_context

            trace_ctx.enter_context(ring_attention_context(mesh, "data"))
        state = shard_train_state(state, mesh, fsdp=run.fsdp,
                                  fsdp_min_size=run.fsdp_min_size)

    if run.resume and ckpt.latest_step() is not None:
        # Restore AFTER mesh placement: the sharded state is the orbax
        # template, so each device reads only its own (FSDP/TP/EP) shard —
        # resume never materializes the full model on one host.
        state, key, _ = ckpt.restore(state, key)
        print(f"[resume] restored step {int(state.step)} from {run.save_dir}")

    accum = max(1, int(run.grad_accum))
    if accum > 1:
        if int(run.steps_per_call) > 1:
            raise ValueError("grad_accum > 1 and steps_per_call > 1 are mutually "
                             "exclusive (dispatch vs memory amortization)")
        if run.dataset == "synthetic-device":
            raise ValueError("grad_accum > 1 needs host-fed microbatches; "
                             "dataset='synthetic-device' generates in-program")
        from hdmoe_tpu.train.train_step import make_train_step_accum

        constrain = None
        if mesh is not None:
            constrain = lambda lat: jax.lax.with_sharding_constraint(  # noqa: E731
                lat, batch_sharding(mesh, lat.ndim))
        step_fn = make_train_step_accum(model_cfg, loss_cfg, optim_cfg, train_cfg,
                                        unet_mask_gen, vit_mask_gen, zeta_sched,
                                        accum=accum, constrain=constrain)
    else:
        step_fn = make_train_step(model_cfg, loss_cfg, optim_cfg, train_cfg,
                                  unet_mask_gen, vit_mask_gen, zeta_sched)

    n_proc = jax.process_count()
    if mesh is not None:
        # Under FSDP the returned state is pinned back to its sharded storage
        # layout so the update reduce-scatters instead of replicating.
        state_shardings = (jax.tree_util.tree_map(lambda x: x.sharding, state)
                           if run.fsdp else None)
        jit_step = make_sharded_train_step(step_fn, mesh, donate_state=True,
                                           state_shardings=state_shardings)
        # pixels arrive as (B, H, W, C), or (accum, B, H, W, C) stacks when
        # accumulating — the batch axis is 4 dims from the end either way
        batch_ax = 0 if accum == 1 else 1
        if n_proc > 1:
            # multi-host: each process feeds only its row-slice of the
            # global batch (parallel/multihost.py); the callable assembles
            # the single global jax.Array the SPMD step consumes.
            from hdmoe_tpu.parallel.multihost import host_local_to_global

            data_target = lambda b: host_local_to_global(  # noqa: E731
                b, mesh, batch_axis=batch_ax)
            if text_emb is not None:
                import numpy as _np

                pid, local = jax.process_index(), run.batch_size // n_proc
                text_emb = host_local_to_global(
                    _np.asarray(text_emb[pid * local:(pid + 1) * local]), mesh)
        else:
            data_target = batch_sharding(mesh, 4 if accum == 1 else 5, axis=batch_ax)
            if text_emb is not None:
                text_emb = jax.device_put(text_emb, batch_sharding(mesh, text_emb.ndim))
    elif n_proc > 1:
        raise ValueError("multi-host training needs run.mesh (a global device mesh)")
    else:
        jit_step = jax.jit(step_fn, donate_argnums=0)

    k_call = max(1, int(run.steps_per_call))
    if run.total_steps % k_call:
        raise ValueError(
            f"total_steps={run.total_steps} must be a multiple of "
            f"steps_per_call={k_call}: the compiled program runs exactly K "
            f"optimizer steps per dispatch, so the budget would overshoot"
        )
    if start_step_aligned := int(state.step) % k_call:
        raise ValueError(
            f"resumed step {int(state.step)} is off the steps_per_call={k_call} "
            f"lattice (offset {start_step_aligned}); resume with the K the run "
            f"was trained with"
        )
    device_gen = run.dataset == "synthetic-device"
    if device_gen:
        # The batch never exists on the host: device synthetic pixels +
        # frozen-VAE encode run INSIDE the (multi-)step program. Requires a
        # traceable VAE (the fake one; the real SD-VAE path keeps host data).
        # Under a mesh, GSPMD partitions the batch-elementwise generator
        # across the data axis — each chip produces its own shard, no host
        # IO, no collectives in the feed path.
        assert hasattr(vae, "_proj"), "synthetic-device requires the fake VAE"
        from hdmoe_tpu.train.data import device_flowers_batch
        from hdmoe_tpu.train.train_step import make_train_devicegen

        def _latents_fn(k):
            kp, ke = jax.random.split(k)
            px = device_flowers_batch(kp, run.batch_size, run.data_img_res)
            if aug is not None:
                ka, ke = jax.random.split(ke)
                px = augment_batch(ka, px, aug)
            return vae.encode(px, ke)

        if run.mesh is not None:
            from hdmoe_tpu.parallel.sharding import make_sharded_train_devicegen

            # state_shardings was derived once in the mesh branch above
            jit_step = make_sharded_train_devicegen(
                step_fn, _latents_fn, text_emb, mesh, k_call,
                state_shardings=state_shardings)
        else:
            jit_step = jax.jit(
                make_train_devicegen(step_fn, _latents_fn, text_emb, k_call), donate_argnums=0
            )
    elif k_call > 1:
        assert run.mesh is None, "steps_per_call > 1 is a single-device knob"
        from hdmoe_tpu.train.train_step import make_train_multistep

        jit_step = jax.jit(make_train_multistep(step_fn, k_call), donate_argnums=0)

    logger = Logger(log_dir=run.log_dir, run_name=run.run_name, log_interval=run.log_interval,
                    # the loop visits steps in strides of K; window-gate the
                    # logger's own `% interval` checks the same way the
                    # fetch/print/save gates below use `< k_call`
                    step_stride=max(1, run.steps_per_call))
    timer = StepTimer()
    evaluator = None  # lazily built at the first eval point (eval_interval)
    ema = None
    if run.ema_decay > 0.0:
        from hdmoe_tpu.train.ema import EmaTracker

        ema = EmaTracker(state.params, decay=run.ema_decay)
    power_ema = None
    if run.ema_posthoc_every > 0:
        from hdmoe_tpu.train.ema import PowerEmaTracker

        power_ema = PowerEmaTracker(state.params)
    configs_blob = {
        "model_configs": model_cfg, "Optim_config": optim_cfg,
        "loss_config": loss_cfg, "mask_config": mask_cfg, "zeta_config": zeta_cfg,
        "run_config": run,
    }

    # ---- hot loop ----------------------------------------------------------
    metrics: Dict[str, jnp.ndarray] = {}
    current_mse = float("inf")
    start_step = int(state.step)
    # Resume continues the deterministic batch stream where it left off
    # (start_batch fast-forward) instead of replaying epoch 0.
    if device_gen:
        data_it = None
    else:
        # each optimizer step consumes `accum` microbatches (k_call steps
        # per dispatch consume one batch each) — fast-forward accordingly.
        # Multi-host: every process walks the SAME seed-deterministic stream
        # but materializes only its row-slice (data.py batch_iterator shard).
        batches = batch_iterator(dataset, run.batch_size, seed=run.seed,
                                 start_batch=start_step * accum,
                                 shard=(jax.process_index(), n_proc) if n_proc > 1 else None)
        group = k_call if k_call > 1 else accum
        if group > 1:
            import numpy as _np

            def _grouped(it, k):
                while True:
                    yield _np.stack([next(it) for _ in range(k)])

            batches = _grouped(batches, group)
        data_it = prefetch_to_device(batches, size=4, device=data_target)
    for step in range(start_step, run.total_steps, k_call):
        key, k_enc, k_step = jax.random.split(key, 3)
        if device_gen:
            state, metrics, aux = jit_step(state, k_step)
        else:
            pixels = next(data_it)
            if pixels.ndim == 5:  # (K|accum, B, ...) stack
                # one encode dispatch for the whole block
                flat = pixels.reshape(pixels.shape[0] * pixels.shape[1], *pixels.shape[2:])
                latents = encode(flat, k_enc)
                latents = latents.reshape(pixels.shape[0], pixels.shape[1], *latents.shape[1:])
            else:
                latents = encode(pixels, k_enc)
            state, metrics, aux = jit_step(state, latents, text_emb, k_step)
        # the params in hand have completed optimizer steps step..step+K-1,
        # so the trackers' "params at optimizer step s" is the block END
        # (at K=1 this is `step`, unchanged)
        step_done = step + k_call - 1
        if ema is not None:
            ema.update(state.params, step_done, steps_elapsed=k_call)
        if power_ema is not None:
            power_ema.update(state.params, step_done, steps_elapsed=k_call)
            if (step > 0 and step % run.ema_posthoc_every < k_call) \
                    or step + k_call >= run.total_steps:
                power_ema.snapshot(step_done)
        timer.tick()

        fetch = (run.telemetry_every <= k_call or step % run.telemetry_every < k_call
                 or step + k_call >= run.total_steps)
        if fetch:
            # One host transfer for all telemetry (not one per scalar — each
            # device->host read costs a full roundtrip).
            metrics, aux = jax.device_get((metrics, aux))
            lrs = current_lrs(optim_cfg, step)
            logger.log_training_step(step, metrics, lr=lrs["unet"],
                                     p_mean=mask_cfg["p_mean"], p_std=mask_cfg["p_std"])
            logger.log_router_statistics(step, aux["unet_probs"], aux["vit_probs"], aux["sigma"],
                                         p_mean=mask_cfg["p_mean"], p_std=mask_cfg["p_std"])
            logger.log_scaling_gating(aux["scaling_factors"], aux["out_gate"], aux["sigma"])
            logger.log_gradients(step, metrics)
            logger.log_weight_statistics(step, state.params)
            current_mse = float(metrics["denoising"])

        if step % run.print_interval < k_call:
            ips = timer.images_per_sec(run.batch_size * k_call * accum)
            print(
                f"Step {step}/{run.total_steps} | loss {float(metrics['loss']):.4f} | "
                f"MSE {current_mse:.4f} | z {float(metrics['z_loss']):.4f} | "
                f"bal {float(metrics['balance']):.4f} | pure {float(metrics['pure_loss']):.4f} | "
                f"logvar {float(metrics['log_var']):.3f}"
                + (f" | {ips:.1f} img/s" if ips else "")
            )
        if run.save_interval and step > 0 and step % run.save_interval < k_call:
            ckpt.save(state, key, mse=current_mse, configs=configs_blob)
        if run.eval_interval and step > 0 and step % run.eval_interval < k_call:
            if evaluator is None:
                from hdmoe_tpu.train.evalhook import TrainEvaluator

                evaluator = TrainEvaluator(
                    model_cfg, dataset, os.path.join(run.log_dir, run.run_name + "_eval"),
                    n=run.eval_n, num_steps=run.eval_num_steps, solver=run.eval_solver,
                    vae_kind=run.vae, text_kind=run.text_encoder,
                    prompt=run.fixed_prompt, seed=run.seed,
                    gather=mesh is not None, logger=logger,
                )
            use_ema = run.eval_use_ema and ema is not None
            rec = evaluator(ema.ema_params if use_ema else state.params,
                            step_done, ema=use_ema)
            print(f"[eval] step {step_done} FID@{rec['n']}={rec['fid']} "
                  f"({rec['tower']}{', ema' if use_ema else ''}) {rec['wall_s']}s")

    trace_ctx.close()
    ckpt.save(state, key, mse=current_mse, configs=configs_blob)
    ckpt.close()
    if ema is not None:
        ema_ckpt = CheckpointManager(str(run.save_dir) + "_ema")
        ema_ckpt.save(state._replace(params=ema.ema_params), key, mse=current_mse)
        ema_ckpt.close()
    if power_ema is not None and power_ema.snapshots:
        from hdmoe_tpu.train.ema import save_power_snapshots

        save_power_snapshots(str(run.save_dir) + "_posthoc.npz", power_ema.snapshots)
    print("Training Complete.")
    return {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}
