"""CLI surface tests (python -m hdmoe_tpu)."""

import json
import subprocess
import sys

import pytest


def _run(args, **kw):
    return subprocess.run(
        [sys.executable, "-m", "hdmoe_tpu", *args],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORM_NAME": "cpu"},
        **kw,
    )


def test_cli_requires_command():
    r = _run([])
    assert r.returncode != 0
    assert "command" in r.stderr


def test_cli_unknown_preset_lists_available():
    r = _run(["train", "definitely_not_a_preset", "--steps", "1"])
    assert r.returncode != 0
    out = r.stderr + r.stdout
    assert "latent_256_clip" in out and "moedit_64expert_ep" in out


def test_cli_plot(tmp_path):
    log = tmp_path / "x_training.jsonl"
    log.write_text(json.dumps({"step": 0, "loss": 1.0, "lr": 1e-3}) + "\n")
    r = _run(["plot", str(tmp_path), "x", "--out", str(tmp_path / "analysis")])
    assert r.returncode == 0, r.stderr
    assert "01_training_dynamics.png" in r.stdout
    assert (tmp_path / "analysis" / "x" / "01_training_dynamics.png").exists()


def test_cli_serve_help():
    r = _run(["serve", "--help"])
    assert r.returncode == 0
    assert "--checkpoint" in r.stdout and "--port" in r.stdout
    assert "--artifact" in r.stdout


def test_cli_export_help():
    """Engine construction itself is covered programmatically (test_deploy.py
    exports a tiny engine bit-exactly); here just the CLI surface."""
    r = _run(["export", "--help"])
    assert r.returncode == 0
    assert "--checkpoint" in r.stdout and "--out" in r.stdout
    # round-4 surface: dial-config export + embedded precompiled executable
    assert "--dial" in r.stdout and "--precompile" in r.stdout


def test_cli_posthoc_ema_roundtrip(tmp_path):
    """posthoc-ema synthesizes a loadable checkpoint from snapshots made by
    PowerEmaTracker (tiny tree saved directly — the CLI only needs the npz
    format and the preset's param structure, so use the real preset's
    structure with a tracked dummy trajectory... too heavy for CPU CI;
    instead drive the help path and the snapshots-format error path)."""
    r = _run(["posthoc-ema", "--help"])
    assert r.returncode == 0
    assert "sigma-rel" in r.stdout
    r = _run(["posthoc-ema", "--snapshots", str(tmp_path / "missing.npz"),
              "--out", str(tmp_path / "out")])
    assert r.returncode != 0


def test_serve_dials_are_valid_config_overrides():
    """SERVE_DIALS (the measured operating points behind `serve --dial`)
    must stay appliable to HDMOEMConfig — guards the dial table against
    config-field renames — and name real solvers."""
    from dataclasses import replace

    from hdmoe_tpu.__main__ import SERVE_DIALS
    from hdmoe_tpu.sampler.dpm import make_sampler, solver_nfe
    from tests.test_model import tiny_cfg

    assert set(SERVE_DIALS) == {"parity", "quality", "throughput"}
    for name, (overrides, solver, steps) in SERVE_DIALS.items():
        cfg = replace(tiny_cfg(), **overrides)  # raises on unknown field
        make_sampler(solver)  # raises on unknown solver
        assert solver_nfe(solver, steps) >= steps
        if name == "quality":
            # round-5 re-pin: dense dispatch (exact under any batch
            # composition; lockstep capacity dials are quality-broken on
            # strong checkpoints — router_telemetry_r5.json)
            assert cfg.dispatch == "dense" and solver == "dpmpp2m"
        if name == "throughput":
            assert solver_nfe(solver, steps) == 14


def test_cli_serve_rejects_unknown_dial():
    r = _run(["serve", "--dial", "warp9"])
    assert r.returncode != 0
    assert "--dial" in r.stderr or "invalid choice" in r.stderr


def test_calibrate_measures_load_shares():
    """obs/calibrate.measure_capacity_profile: shares sum to 1 per path,
    profiles carry slack, flops multiplier consistent (the round-5
    capacity_profile dial input)."""
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.obs.calibrate import measure_capacity_profile
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    up, vp, rep = measure_capacity_profile(params, cfg, batch=8, num_steps=4,
                                           slack=1.25)
    assert len(up) == cfg.num_experts and len(vp) == cfg.num_experts
    assert abs(sum(rep["unet_loads"]) - 1.0) < 1e-6
    assert abs(sum(rep["vit_loads"]) - 1.0) < 1e-6
    for prof, loads in ((up, rep["unet_loads"]), (vp, rep["vit_loads"])):
        for f, l in zip(prof, loads):
            assert f >= min(1.0, l)  # slack never under-provisions
    assert rep["flops_multiplier_vs_cf1"] > 0


def test_calibrate_cli_help():
    r = _run(["calibrate", "--help"])
    assert r.returncode == 0
    assert "--slack" in r.stdout
