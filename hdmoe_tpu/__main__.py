"""Command-line interface: ``python -m hdmoe_tpu <command>``.

The reference's only "CLI" is an ``if __name__ == '__main__'`` block
(Utils/training.py:347-353); this is the framework-grade replacement.

Commands:
  train   — run training for a named preset
  sample  — sample a grid from a checkpoint
  bench   — the throughput benchmark (same as bench.py)
  plot    — render analysis dashboards from a run's JSONL logs
  smoke   — tiny hermetic end-to-end training run
"""

from __future__ import annotations

import argparse
import sys


def _cmd_train(args):
    import os

    if args.multihost or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # must run before any jax computation creates the backend
        from hdmoe_tpu.parallel.multihost import initialize

        pid, nproc = initialize()
        print(f"[multihost] process {pid}/{nproc}")
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.train_loop import training_hdmoe
    from dataclasses import replace

    builder = presets.PRESETS.get(args.preset)
    if builder is None:
        sys.exit(f"unknown preset '{args.preset}'; available: {sorted(presets.PRESETS)}")
    model, optim, loss, mask, run = builder(total_steps=args.steps)
    overrides = {}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.resume:
        overrides["resume"] = True
    if args.ema_decay:
        overrides["ema_decay"] = args.ema_decay
    if args.dataset:
        overrides["dataset"] = args.dataset
    if args.steps_per_call:
        overrides["steps_per_call"] = args.steps_per_call
    if args.grad_accum:
        overrides["grad_accum"] = args.grad_accum
    if args.eval_interval:
        overrides["eval_interval"] = args.eval_interval
    if args.mesh:
        from hdmoe_tpu.parallel import MeshConfig

        sizes = [int(x) for x in args.mesh.split(",")]
        sizes += [1] * (3 - len(sizes))
        overrides["mesh"] = MeshConfig(*sizes[:3])
    if args.fsdp:
        overrides["fsdp"] = True
    if args.augment is not None:
        from hdmoe_tpu.train.augment import AugmentConfig

        kw = {}
        if args.augment:  # "hflip=0.5,translate=0.1" style overrides
            valid = set(AugmentConfig.__dataclass_fields__)
            for pair in args.augment.split(","):
                k, eq, v = pair.partition("=")
                k = k.strip()
                if k not in valid:
                    sys.exit(f"--augment: unknown op '{k}'; valid: {sorted(valid)}")
                try:
                    kw[k] = float(v)
                except ValueError:
                    sys.exit(f"--augment: '{pair}' is not of the form op=float")
        overrides["augment"] = AugmentConfig(**kw)
    if overrides:
        run = replace(run, **overrides)
    training_hdmoe(model, optim, loss, mask, zeta_configs, run)


def _cmd_sample(args):
    from hdmoe_tpu.models import default_model_config
    from hdmoe_tpu.sampler.generate import sample_and_save

    if args.preset:
        from hdmoe_tpu.train import presets

        builder = presets.PRESETS.get(args.preset)
        if builder is None:
            sys.exit(f"unknown preset '{args.preset}'; available: {sorted(presets.PRESETS)}")
        cfg = builder()[0]
    else:
        cfg = default_model_config()
    sample_and_save(
        cfg,
        checkpoint_dir=args.checkpoint,
        out_dir=args.out,
        batch_size=args.batch_size,
        num_steps=args.steps,
        guidance=args.guidance,
        prompt=args.prompt,
        vae_kind=args.vae,
        text_kind=args.text_encoder,
        seed=args.seed,
        solver=args.solver,
    )
    print(f"wrote samples to {args.out}")


def _cmd_bench(args):
    import bench

    bench.main()


def _cmd_plot(args):
    from hdmoe_tpu.obs.plotter import Plotter

    p = Plotter(args.log_dir, args.run_name, out_dir=args.out)
    outs = p.plot_all()
    for o in outs:
        print(f"rendered {o}")


def _cmd_smoke(args):
    from hdmoe_tpu.train.smoke import main as smoke_main

    smoke_main(args.steps)


def _cmd_posthoc_ema(args):
    """Synthesize a post-hoc EMA checkpoint from power-profile snapshots
    (train with ``--ema-posthoc-every`` / RunConfig.ema_posthoc_every to
    produce <save_dir>_posthoc.npz)."""
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train import presets
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.ema import load_power_snapshots, posthoc_ema
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    import os

    if not os.path.exists(args.snapshots):
        sys.exit(f"snapshots file not found: {args.snapshots}")
    builder = presets.PRESETS.get(args.preset)
    if builder is None:
        sys.exit(f"unknown preset '{args.preset}'; available: {sorted(presets.PRESETS)}")
    model = builder()[0]
    params0 = jax.jit(lambda k: precond_init(k, model))(jax.random.PRNGKey(0))
    snaps = load_power_snapshots(args.snapshots, params0)
    t_target = args.t if args.t else max(t for _, t, _ in snaps)
    tree = posthoc_ema(snaps, t_target, sigma_rel=args.sigma_rel)
    import jax.numpy as jnp

    tree = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), tree)
    cm = CheckpointManager(args.out)
    cm.save(init_train_state(tree, OptimConfig())._replace(step=jnp.asarray(int(t_target))),
            jax.random.PRNGKey(0), mse=float("nan"))
    cm.close()
    print(f"wrote sigma_rel={args.sigma_rel} t={t_target:g} post-hoc EMA checkpoint to {args.out}")


def _cmd_calibrate(args):
    """Measure per-expert routing load shares -> capacity_profile fractions.

    The round-5 serving dial: staggered sampling + load-profiled per-expert
    capacities matches-or-beats dense FID at capacity-dispatch speed
    (PERF.md round-5 section), but the shares are a CHECKPOINT property —
    calibrate once per deployed checkpoint and pin the printed fractions in
    the serving config (capacity_profile_unet/vit).
    """
    import json

    import jax

    from hdmoe_tpu.models import default_model_config, precond_init
    from hdmoe_tpu.obs.calibrate import measure_capacity_profile
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    if args.preset:
        from hdmoe_tpu.train import presets

        builder = presets.PRESETS.get(args.preset)
        if builder is None:
            sys.exit(f"unknown preset '{args.preset}'; available: {sorted(presets.PRESETS)}")
        cfg = builder()[0]
    else:
        cfg = default_model_config()
    params0 = jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0))
    cm = CheckpointManager(args.checkpoint)
    state, _, _ = cm.restore(init_train_state(params0, OptimConfig()),
                             jax.random.PRNGKey(0))
    cm.close()
    _, _, report = measure_capacity_profile(
        state.params, cfg, batch=args.batch_size, num_steps=args.steps,
        slack=args.slack)
    print(json.dumps(report, indent=1))


def _cmd_fid(args):
    import json

    from hdmoe_tpu.models import default_model_config
    from hdmoe_tpu.obs.fid import fid_from_checkpoint

    if args.preset:
        from hdmoe_tpu.train import presets

        builder = presets.PRESETS.get(args.preset)
        if builder is None:
            sys.exit(f"unknown preset '{args.preset}'; available: {sorted(presets.PRESETS)}")
        cfg = builder()[0]
    else:
        cfg = default_model_config()
    out = fid_from_checkpoint(
        cfg, args.checkpoint, dataset_name=args.dataset, data_root=args.data_root,
        resolution=args.resolution, n=args.n, batch=args.batch_size,
        num_steps=args.steps, tower=args.tower, vae=args.vae, text=args.text_encoder,
        prompt=args.prompt, seed=args.seed, solver=args.solver,
    )
    print(json.dumps(out))


# measured serving operating points (PERF.md solver-dial table, canonical
# checkpoint): model-config overrides + (solver, num_steps) per dial. The
# img/s figures are loaded-host v5e; FID is the hermetic random-conv tower.
SERVE_DIALS = {
    # reference-faithful fp32 dense Heun-35 (FID anchor 1.43, ~75 img/s)
    "parity": (dict(), "heun", 18),
    # dpm20 DENSE (round-5 re-pin): the round-3/4 dpm20+cf2p quality dial
    # is quality-broken on strong checkpoints under LOCKSTEP batching
    # (routing collapse, artifacts/router_telemetry_r5.json: FID 2.83 on
    # the b128+LRx2 checkpoint where dense scores 0.286). Dense dispatch
    # is exact under any batch composition, and dpm-20 beats heun-18 on
    # both axes on BOTH checkpoints (dpm_eval_r3.json; staggered dense
    # control 0.2618 vs 0.2857, staggered_dial_r5.json). For capacity-
    # dispatch speed AT dense quality, calibrate a capacity_profile
    # (`python -m hdmoe_tpu calibrate`) and use the staggered engine
    # (sampler/staggered.py: dpm20+profile 374 img/s @ FID 0.2612).
    "quality": (dict(compute_dtype="bfloat16", use_flash=True,
                     dispatch="dense"), "dpmpp2m", 20),
    # dpm14 + cf=1.0 priority: 670 img/s at --batch-size 512 at the
    # capacity dial's FID ~2.1 (frontier_b512_r3.json); einsum dispatch
    # round 4 (+9.6% at the 35-NFE point, einsum_dispatch_ab_r4.json)
    "throughput": (dict(compute_dtype="bfloat16", use_flash=True,
                        dispatch="einsum", capacity_factor=1.0,
                        capacity_policy="priority"), "dpmpp2m", 14),
}


def _build_engine(args, streaming: bool = False):
    """Shared by serve/export: preset/checkpoint -> SamplerEngine (or the
    continuous-batching StreamingEngine when ``streaming``, built directly so
    no throwaway lockstep AOT compile is paid)."""
    from hdmoe_tpu.models import default_model_config, precond_init
    from hdmoe_tpu.serve import SamplerEngine

    import jax

    if args.preset:
        from hdmoe_tpu.train import presets

        builder = presets.PRESETS.get(args.preset)
        if builder is None:
            sys.exit(f"unknown preset '{args.preset}'; available: {sorted(presets.PRESETS)}")
        cfg = builder()[0]
    else:
        cfg = default_model_config()
    dial = getattr(args, "dial", "")
    if dial:
        from dataclasses import replace as _replace

        if dial not in SERVE_DIALS:
            sys.exit(f"unknown --dial '{dial}'; available: {sorted(SERVE_DIALS)}")
        overrides, solver, steps = SERVE_DIALS[dial]
        cfg = _replace(cfg, **overrides)
        args.solver, args.steps = solver, steps
    # validate mesh divisibility BEFORE the (expensive) param init/compile
    mesh_n = int(getattr(args, "mesh", 0) or 0)
    buckets = getattr(args, "buckets", "")
    bucket_sizes = tuple(int(b) for b in buckets.split(",")) if buckets else ()
    if mesh_n and bucket_sizes and any(b % mesh_n for b in bucket_sizes):
        sys.exit(f"--buckets {buckets}: every bucket must be a multiple "
                 f"of --mesh {mesh_n} (each batch shards over the data axis)")
    if mesh_n and not bucket_sizes and args.batch_size % mesh_n:
        sys.exit(f"--batch-size {args.batch_size} must be a multiple of "
                 f"--mesh {mesh_n} (the batch shards over the data axis)")
    params = jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0))
    if args.checkpoint:
        from hdmoe_tpu.train.checkpoint import CheckpointManager
        from hdmoe_tpu.train.optim import OptimConfig
        from hdmoe_tpu.train.train_step import init_train_state

        state, _, _ = CheckpointManager(args.checkpoint).restore(
            init_train_state(params, OptimConfig()), jax.random.PRNGKey(0)
        )
        params = state.params
    else:
        print("WARNING: serving random-init weights (no --checkpoint)", flush=True)
    kw = dict(
        num_steps=args.steps, guidance=args.guidance, vae_kind=args.vae,
        text_kind=args.text_encoder, solver=getattr(args, "solver", "heun"),
        quantize=getattr(args, "quantize", "none"),
    )
    if streaming:
        if mesh_n or bucket_sizes:
            sys.exit("--stream is a single-device slot engine: drop --mesh/--buckets")
        from hdmoe_tpu.serve_stream import StreamingEngine

        return StreamingEngine(cfg, params, batch=args.batch_size,
                               ticks_per_call=args.ticks_per_call, **kw)
    if mesh_n:
        from hdmoe_tpu.parallel import MeshConfig, make_mesh

        kw["mesh"] = make_mesh(MeshConfig(data=mesh_n))
    if bucket_sizes:
        from hdmoe_tpu.serve import BucketedEngine

        return BucketedEngine(cfg, params, buckets=bucket_sizes, **kw)
    return SamplerEngine(cfg, params, batch=args.batch_size, **kw)


def _cmd_serve(args):
    from hdmoe_tpu.serve import serve

    if args.artifact:
        if args.stream:
            sys.exit("--stream needs a live engine (exported artifacts are "
                     "lockstep whole-batch executables); drop --artifact")
        from hdmoe_tpu.deploy import load_sampler

        engine = load_sampler(args.artifact)
        print(f"serving exported artifact {args.artifact} "
              f"(batch={engine.batch}, platforms={engine.meta['platforms']})")
    else:
        engine = _build_engine(args, streaming=args.stream)
    frontend = None
    if args.stream:
        from hdmoe_tpu.serve_stream import StreamingFrontend

        frontend = StreamingFrontend(engine)
        print(f"continuous batching: {engine.batch} slots, "
              f"{engine.ticks_per_call} tick(s)/device call")
    serve(engine, host=args.host, port=args.port,
          pipeline=not args.no_pipeline, frontend=frontend)


def _cmd_export(args):
    from hdmoe_tpu.deploy import export_sampler

    engine = _build_engine(args)
    meta = export_sampler(engine, args.out,
                          precompile=getattr(args, "precompile", False))
    import os

    print(f"exported {args.out} ({os.path.getsize(args.out)} bytes): "
          f"{meta['platforms']} batch={meta['batch']} steps={meta['num_steps']}"
          + (f" precompiled={meta['precompiled_backend']}"
             if meta.get("precompiled_backend") else ""))


def _cmd_import(args):
    from hdmoe_tpu.adapters.port import import_reference_checkpoint
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    import jax
    import jax.numpy as jnp

    params, cfg, meta = import_reference_checkpoint(
        args.checkpoint, variant=args.variant
    )
    # Fresh optimizer state: the reference's Adam moments are keyed to its
    # torch param layout and aren't portable; training resumes warm on the
    # weights, cold on the moments.
    state = init_train_state(params, OptimConfig())
    state = state._replace(step=jnp.asarray(meta["step"], jnp.int32))
    CheckpointManager(args.out).save(
        state, jax.random.PRNGKey(args.seed), mse=meta["mse"],
        configs={**meta["config"], "variant": meta["variant"]},
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(
        f"imported {args.checkpoint} ({meta['variant']}, step {meta['step']}, "
        f"{n:,} params) -> {args.out}\n"
        f"sample with: python -m hdmoe_tpu sample --checkpoint {args.out}"
    )


def _cmd_export_ckpt(args):
    import json
    from pathlib import Path

    import jax

    from hdmoe_tpu.adapters.port import (
        export_reference_checkpoint,
        model_config_from_saved_json,
    )
    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.train.checkpoint import CheckpointManager
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_step import init_train_state

    mgr = CheckpointManager(args.checkpoint)
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        sys.exit(f"no checkpoints under {args.checkpoint}")
    if args.preset:
        from hdmoe_tpu.train import presets

        cfg = presets.PRESETS[args.preset]()[0]
    else:
        cfg_file = Path(args.checkpoint) / f"config_{step}.json"
        if not cfg_file.exists():
            sys.exit(f"{cfg_file} not found — pass --preset to supply the model config")
        cfg = model_config_from_saved_json(json.loads(cfg_file.read_text()))
    state = init_train_state(
        jax.jit(lambda k: precond_init(k, cfg))(jax.random.PRNGKey(0)), OptimConfig()
    )
    state, _, mse = mgr.restore(state, jax.random.PRNGKey(0), step=step)
    export_reference_checkpoint(state.params, cfg, args.out, step=int(state.step), mse=mse)
    print(f"exported step {int(state.step)} ({cfg.variant}) -> {args.out}\n"
          f"loadable by the reference: torch.load(...)['model_state_dict']")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="hdmoe_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a preset config")
    p_train.add_argument("preset", help="preset name from hdmoe_tpu.train.presets")
    p_train.add_argument("--steps", type=int, default=5000)
    p_train.add_argument("--batch-size", type=int, default=0)
    p_train.add_argument("--resume", action="store_true")
    p_train.add_argument("--ema-decay", type=float, default=0.0)
    p_train.add_argument("--dataset", default="",
                         help="override the preset dataset (synthetic | "
                              "synthetic-native | synthetic-device | "
                              "imagefolder | flowers102 | cifar10)")
    p_train.add_argument("--augment", nargs="?", const="", default=None,
                         help="on-device augmentation before the VAE encode "
                              "(bare flag = default recipe: hflip 0.5 + "
                              "translate 0.125; or 'hflip=0.5,rot90=0.25,"
                              "translate=0.1,brightness=0.1,contrast=0.2')")
    p_train.add_argument("--steps-per-call", type=int, default=0,
                         help="K optimizer steps per device dispatch "
                              "(single-device; amortizes dispatch/transfer)")
    p_train.add_argument("--grad-accum", type=int, default=0,
                         help="average gradients over N microbatches per "
                              "optimizer step (effective batch N*batch_size "
                              "at one microbatch's memory)")
    p_train.add_argument("--eval-interval", type=int, default=0,
                         help="score the live (EMA when tracked) weights with "
                              "a small streaming FID + sample grid every N "
                              "steps (train/evalhook.py; eval JSONL stream)")
    p_train.add_argument("--mesh", default="",
                         help="DATA[,MODEL[,EXPERT]] mesh axis sizes "
                              "(e.g. '8' or '4,2'; default single device)")
    p_train.add_argument("--fsdp", action="store_true",
                         help="ZeRO/FSDP: store params + Adam moments sharded "
                              "over the data axis (needs --mesh with data>1)")
    p_train.add_argument("--multihost", action="store_true",
                         help="initialize jax.distributed from the environment "
                              "(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                              "JAX_PROCESS_ID, or TPU-pod auto-detection) and "
                              "feed each process only its slice of the global "
                              "batch (parallel/multihost.py)")
    p_train.set_defaults(fn=_cmd_train)

    p_sample = sub.add_parser("sample", help="sample from a checkpoint")
    p_sample.add_argument("checkpoint", help="checkpoint directory")
    p_sample.add_argument("--preset", default="", help="model preset the checkpoint was trained with")
    p_sample.add_argument("--out", default="generated_samples")
    p_sample.add_argument("--batch-size", type=int, default=16)
    p_sample.add_argument("--steps", type=int, default=40)
    p_sample.add_argument("--guidance", type=float, default=1.0)
    p_sample.add_argument("--prompt", default="a photo of a flower")
    p_sample.add_argument("--vae", default="fake")
    p_sample.add_argument("--text-encoder", default="fake")
    p_sample.add_argument("--seed", type=int, default=0)
    p_sample.add_argument("--solver", default="heun", choices=["heun", "dpmpp2m"],
                          help="ODE solver: heun = 2N-1 NFE (reference), dpmpp2m = N NFE")
    p_sample.set_defaults(fn=_cmd_sample)

    p_bench = sub.add_parser("bench", help="throughput benchmark")
    p_bench.set_defaults(fn=_cmd_bench)

    p_plot = sub.add_parser("plot", help="render analysis dashboards")
    p_plot.add_argument("log_dir")
    p_plot.add_argument("run_name")
    p_plot.add_argument("--out", default="analysis_results")
    p_plot.set_defaults(fn=_cmd_plot)

    p_import = sub.add_parser(
        "import-checkpoint",
        help="convert a reference torch checkpoint (save_checkpoint .pt) "
             "into an orbax checkpoint this framework trains/samples from",
    )
    p_import.add_argument("checkpoint", help="path to the reference .pt file")
    p_import.add_argument("--out", default="./checkpoints/imported")
    p_import.add_argument("--variant", default="config1",
                          help="reference model class if ambiguous "
                               "(config1 checkpoints self-identify)")
    p_import.add_argument("--seed", type=int, default=0)
    p_import.set_defaults(fn=_cmd_import)

    p_export_ckpt = sub.add_parser(
        "export-checkpoint",
        help="convert an orbax checkpoint from this framework into a "
             "reference-loadable torch .pt (inverse of import-checkpoint)",
    )
    p_export_ckpt.add_argument("checkpoint", help="orbax checkpoint directory")
    p_export_ckpt.add_argument("--out", default="./exported_reference.pt")
    p_export_ckpt.add_argument("--step", type=int, default=None,
                               help="checkpoint step (default: latest)")
    p_export_ckpt.add_argument("--preset", default="",
                               help="model preset if the checkpoint has no "
                                    "config_{step}.json")
    p_export_ckpt.set_defaults(fn=_cmd_export_ckpt)

    p_smoke = sub.add_parser("smoke", help="hermetic end-to-end smoke run")
    p_smoke.add_argument("--steps", type=int, default=5)
    p_smoke.set_defaults(fn=_cmd_smoke)

    p_cal = sub.add_parser(
        "calibrate",
        help="measure per-expert routing load shares for the "
             "capacity_profile serving dial (PERF.md round 5)")
    p_cal.add_argument("checkpoint")
    p_cal.add_argument("--preset", default="")
    p_cal.add_argument("--batch-size", type=int, default=128)
    p_cal.add_argument("--steps", type=int, default=18)
    p_cal.add_argument("--slack", type=float, default=1.2)
    p_cal.set_defaults(fn=_cmd_calibrate)

    p_fid = sub.add_parser("fid", help="FID @ n between a checkpoint's samples and a dataset")
    p_fid.add_argument("checkpoint")
    p_fid.add_argument("--preset", default="")
    p_fid.add_argument("--dataset", default="synthetic")
    p_fid.add_argument("--data-root", default="./data")
    p_fid.add_argument("--resolution", type=int, default=256)
    p_fid.add_argument("--n", type=int, default=50_000)
    p_fid.add_argument("--batch-size", type=int, default=32)
    p_fid.add_argument("--steps", type=int, default=18)
    p_fid.add_argument("--tower", default="auto", choices=["auto", "clip", "random"])
    p_fid.add_argument("--vae", default="fake")
    p_fid.add_argument("--text-encoder", default="fake")
    p_fid.add_argument("--prompt", default="a photo of a flower")
    p_fid.add_argument("--seed", type=int, default=0)
    p_fid.add_argument("--solver", default="heun", choices=["heun", "dpmpp2m"],
                       help="ODE solver: heun = 2N-1 NFE (reference), dpmpp2m = N NFE")
    p_fid.set_defaults(fn=_cmd_fid)

    p_ph = sub.add_parser("posthoc-ema", help="synthesize an EMA checkpoint of any averaging length from power-profile snapshots")
    p_ph.add_argument("--preset", default="latent_256_clip")
    p_ph.add_argument("--snapshots", required=True, help="<save_dir>_posthoc.npz from training")
    p_ph.add_argument("--sigma-rel", type=float, default=0.10, dest="sigma_rel")
    p_ph.add_argument("--t", type=float, default=0.0, help="target step (default: last snapshot time)")
    p_ph.add_argument("--out", default="./checkpoints/posthoc_ema")
    p_ph.set_defaults(fn=_cmd_posthoc_ema)

    p_serve = sub.add_parser("serve", help="HTTP sampling server (AOT engine + coalescing frontend)")
    p_serve.add_argument("--preset", default="", help="model preset (default: flagship config)")
    p_serve.add_argument("--checkpoint", default="", help="checkpoint directory to serve")
    p_serve.add_argument("--batch-size", type=int, default=16)
    p_serve.add_argument("--steps", type=int, default=18)
    p_serve.add_argument("--guidance", type=float, default=1.0)
    p_serve.add_argument("--vae", default="fake", choices=["fake", "none", "real", "auto"])
    p_serve.add_argument("--text-encoder", default="fake", choices=["fake", "real", "auto"])
    p_serve.add_argument("--solver", default="heun", choices=["heun", "dpmpp2m"])
    p_serve.add_argument("--dial", default="", choices=["", "parity", "quality", "throughput"],
                         help="measured operating point (PERF.md solver-dial table): "
                              "sets model dtype/dispatch overrides AND solver+steps "
                              "(overriding --solver/--steps); batch/buckets/mesh/quantize still apply")
    p_serve.add_argument("--quantize", default="none", choices=["none", "int8"],
                         help="weight-only int8 (smaller params/artifact; fp32 math elsewhere)")
    p_serve.add_argument("--buckets", default="",
                         help="comma list of batch buckets (e.g. 1,4,16): one AOT "
                              "executable per size, requests route to the smallest fit "
                              "(overrides --batch-size)")
    p_serve.add_argument("--mesh", type=int, default=0,
                         help="data-parallel serving: shard each sampling "
                              "batch over N devices (batch/bucket sizes must "
                              "be multiples of N; params replicate)")
    p_serve.add_argument("--stream", action="store_true",
                         help="continuous (in-flight) batching: per-sample-sigma "
                              "solver ticks admit new requests at step granularity "
                              "(serve_stream.py; single-device, no --mesh/--buckets)")
    p_serve.add_argument("--ticks-per-call", type=int, default=1,
                         help="solver ticks chained per device call under --stream "
                              "(K>1 amortizes dispatch overhead at K-step "
                              "admission granularity)")
    p_serve.add_argument("--no-pipeline", action="store_true",
                         help="disable the one-deep dispatch pipeline (fetch each batch before dispatching the next)")
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8777)
    p_serve.add_argument("--artifact", default="",
                         help="serve a file written by `export` instead of "
                              "building the model (ignores the engine flags)")
    p_serve.set_defaults(fn=_cmd_serve)

    p_export = sub.add_parser(
        "export",
        help="export the AOT sampler (+VAE decode, weights baked in) to a "
             "self-contained artifact servable without model code",
    )
    p_export.add_argument("--preset", default="", help="model preset (default: flagship config)")
    p_export.add_argument("--checkpoint", default="", help="checkpoint directory to export")
    p_export.add_argument("--out", default="sampler.hdmoe")
    p_export.add_argument("--batch-size", type=int, default=16)
    p_export.add_argument("--steps", type=int, default=18)
    p_export.add_argument("--guidance", type=float, default=1.0)
    p_export.add_argument("--dial", default="", choices=["", "parity", "quality", "throughput"],
                          help="export a serving dial's exact config/solver/steps "
                               "(same table as serve --dial)")
    p_export.add_argument("--vae", default="fake", choices=["fake", "none", "real", "auto"])
    p_export.add_argument("--text-encoder", default="fake", choices=["fake", "real", "auto"])
    p_export.add_argument("--solver", default="heun", choices=["heun", "dpmpp2m"])
    p_export.add_argument("--quantize", default="none", choices=["none", "int8"],
                          help="weight-only int8 (~4x smaller artifact; quality roundtrip-tested)")
    p_export.add_argument("--precompile", action="store_true",
                          help="embed the compiled executable for the current "
                               "backend/device kind — a matching serving host "
                               "boots with zero XLA compile (falls back to "
                               "StableHLO elsewhere)")
    p_export.set_defaults(fn=_cmd_export)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
