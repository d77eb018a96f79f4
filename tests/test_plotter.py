"""Plotter tests: render all dashboards from synthetic JSONL + a live model."""

import json

import jax
import numpy as np

from hdmoe_tpu.obs.plotter import Plotter, make_router_probe, parse_jsonl


def _write_logs(tmp_path, run="t"):
    train = []
    for s in range(0, 50, 10):
        train.append({
            "step": s, "loss": 1.0 / (s + 1), "denoising": 0.2, "pure_loss": 0.5,
            "log_var": -0.1, "zeta": 2.0 - s * 0.01, "balance": 0.1, "z_loss": 0.01,
            "lr": 5e-4, "scaling_vit_mean": 1.1, "scaling_unet_mean": 0.9,
            "scaling_vit_min": 0.5, "scaling_vit_max": 1.5, "scaling_unet_min": 0.4,
            "scaling_unet_max": 1.4, "gate_wx": 0.6, "gate_wa": 0.4,
            "noise_level": 0.3, "noise_level_min": 0.01, "noise_level_max": 10.0,
        })
    router = [{"step": 40, "unet_expert_usage": [0.4, 0.6], "vit_expert_usage": [0.5, 0.5]}]
    grads = [{"step": s, "Unet_experts_grad_norm": 0.5, "VIT_experts_grad_norm": 0.3} for s in range(0, 50, 10)]
    for name, recs in (("training", train), ("router_stats", router), ("gradients", grads)):
        with open(tmp_path / f"{run}_{name}.jsonl", "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")


def test_parse_jsonl_skips_malformed(tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"a": 1}\nnot json\n{"b": 2}\n')
    recs = parse_jsonl(p)
    assert recs == [{"a": 1}, {"b": 2}]
    assert parse_jsonl(tmp_path / "missing.jsonl") == []


def test_plotter_renders_dashboards(tmp_path):
    _write_logs(tmp_path)
    plotter = Plotter(str(tmp_path), "t", out_dir=str(tmp_path / "analysis"))
    outs = plotter.plot_all()
    names = {o.name for o in outs}
    assert names == {"01_training_dynamics.png", "03_scaling_gating.png", "04_gradients.png"}
    for o in outs:
        assert o.stat().st_size > 10_000  # real rendered figures


def test_expert_specialization_sweep(tmp_path):
    from hdmoe_tpu.models import precond_init
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg(text_emb_dim=0)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    probe = make_router_probe(params, cfg)
    plotter = Plotter(str(tmp_path), "t", out_dir=str(tmp_path / "analysis"))
    out = plotter.plot_expert_specialization(probe, num_sigmas=8)
    assert out.exists() and out.stat().st_size > 10_000


def test_fid_vs_nfe_plot(tmp_path):
    """Reference to-do 6.3 (README.md:13) realized: FID-vs-NFE curve from
    the <run>_fid.jsonl stream (written by scripts/fid_vs_nfe.py)."""
    import json

    rows = [{"nfe": n, "fid": f, "tower": "random-conv", "n": 100}
            for n, f in [(3, 200.0), (9, 90.0), (35, 30.0)]]
    (tmp_path / "t_fid.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    plotter = Plotter(str(tmp_path), "t", out_dir=str(tmp_path / "analysis"))
    out = plotter.plot_fid_vs_nfe()
    assert out is not None and out.exists() and out.stat().st_size > 10_000
    # plot_all picks the stream up too
    assert "05_fid_vs_nfe.png" in {o.name for o in plotter.plot_all()}


def test_fid_vs_nfe_plot_two_solvers(tmp_path):
    """Records carrying a "solver" field render one labeled curve per
    solver (heun default for pre-solver records — backward compatible)."""
    import json

    rows = [{"nfe": n, "fid": f, "tower": "random-conv", "n": 100}
            for n, f in [(3, 200.0), (9, 90.0), (35, 30.0)]]
    rows += [{"nfe": n, "fid": f, "solver": "dpmpp2m", "tower": "random-conv",
              "n": 100} for n, f in [(3, 150.0), (9, 60.0), (35, 29.0)]]
    (tmp_path / "t_fid.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    plotter = Plotter(str(tmp_path), "t", out_dir=str(tmp_path / "analysis"))
    out = plotter.plot_fid_vs_nfe()
    assert out is not None and out.exists() and out.stat().st_size > 10_000


def test_eval_trend_plot(tmp_path):
    """In-training eval stream (train/evalhook.py) renders a FID-vs-step
    trend, one labeled curve per weight kind (raw / EMA)."""
    import json

    rows = [{"step": s, "fid": f, "tower": "random-conv", "n": 64, "ema": False}
            for s, f in [(100, 40.0), (200, 20.0), (300, 12.0)]]
    rows += [{"step": s, "fid": f, "tower": "random-conv", "n": 64, "ema": True}
             for s, f in [(200, 18.0), (300, 9.0)]]
    (tmp_path / "t_eval.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    plotter = Plotter(str(tmp_path), "t", out_dir=str(tmp_path / "analysis"))
    out = plotter.plot_eval_trend()
    assert out is not None and out.exists() and out.stat().st_size > 10_000
    assert "06_eval_trend.png" in {o.name for o in plotter.plot_all()}
