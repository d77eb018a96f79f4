"""Offline analysis plots from JSONL telemetry.

Re-design of reference graphs/plotter.py: four dashboards rendered from the
Logger's JSONL streams (plus a live-model expert-specialization sweep),
written as PNGs under ``analysis_results/<run>/``.

- ``plot_training_dynamics``   <- plot_comprehensive_training_dynamics
  (plotter.py:65-220): loss/MSE curves, log-var, zeta, aux losses, LR,
  usage pie, summary table.
- ``plot_expert_specialization`` <- plot_expert_specialization_advanced
  (plotter.py:225-301): sweep 100 log-spaced sigmas through both routers of
  a live model and heat-map the gate probabilities.
- ``plot_scaling_gating``      <- plot_scaling_and_gating_analysis
  (plotter.py:306-366).
- ``plot_gradient_flow``       <- plot_gradient_flow (plotter.py:371-437)
  with vanishing/exploding summary.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def parse_jsonl(path) -> List[dict]:
    """Robust JSONL reader: skips malformed lines (plotter.py:442-467)."""
    records = []
    p = Path(path)
    if not p.exists():
        return records
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            records.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return records


def _col(records: List[dict], key: str):
    xs, ys = [], []
    for r in records:
        if key in r and r[key] is not None:
            xs.append(r.get("step", len(xs)))
            ys.append(r[key])
    return np.asarray(xs), np.asarray(ys, dtype=np.float64)


class Plotter:
    def __init__(self, log_dir: str, run_name: str, out_dir: str = "analysis_results"):
        self.log_dir = Path(log_dir)
        self.run_name = run_name
        self.out_dir = Path(out_dir) / run_name
        self.out_dir.mkdir(parents=True, exist_ok=True)

    def _stream(self, suffix: str) -> List[dict]:
        return parse_jsonl(self.log_dir / f"{self.run_name}_{suffix}.jsonl")

    # ------------------------------------------------------------------ 01
    def plot_training_dynamics(self) -> Optional[Path]:
        recs = self._stream("training")
        router = self._stream("router_stats")
        if not recs:
            return None
        fig, axes = plt.subplots(3, 3, figsize=(18, 12))
        panels = [
            ("loss", "Total loss"), ("denoising", "Denoising MSE"), ("pure_loss", "Pure (uncertainty) loss"),
            ("log_var", "Learned log-variance"), ("zeta", "Router exploration zeta"), ("balance", "Load-balance loss"),
            ("z_loss", "Router z-loss"), ("lr", "Learning rate"),
        ]
        for ax, (key, title) in zip(axes.flat, panels):
            x, y = _col(recs, key)
            if len(y):
                ax.plot(x, y, lw=1.2)
            ax.set_title(title)
            ax.set_xlabel("step")
            ax.grid(alpha=0.3)
        ax = axes.flat[8]
        if router and "unet_expert_usage" in router[-1]:
            usage = np.asarray(router[-1]["unet_expert_usage"], dtype=np.float64)
            if usage.sum() > 0:
                ax.pie(usage, labels=[f"E{i}" for i in range(len(usage))], autopct="%1.0f%%")
            ax.set_title("U-Net expert usage (final)")
        fig.suptitle(f"Training dynamics — {self.run_name}")
        fig.tight_layout()
        out = self.out_dir / "01_training_dynamics.png"
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out

    # ------------------------------------------------------------------ 02
    def plot_expert_specialization(
        self,
        router_probe,
        num_sigmas: int = 100,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
    ) -> Optional[Path]:
        """Live-model sweep: ``router_probe(sigma_batch) -> (unet_probs,
        vit_probs)`` with sigma (N,) log-spaced; heat-map gate probabilities
        per expert vs noise level (plotter.py:225-301)."""
        sigmas = np.exp(np.linspace(np.log(sigma_min), np.log(sigma_max), num_sigmas))
        unet, vit = router_probe(sigmas)
        unet = np.asarray(unet)
        vit = np.asarray(vit)
        fig, axes = plt.subplots(1, 2, figsize=(14, 5))
        for ax, probs, name in ((axes[0], unet, "U-Net"), (axes[1], vit, "ViT")):
            im = ax.imshow(
                probs.T, aspect="auto", origin="lower", cmap="viridis",
                extent=[np.log10(sigma_min), np.log10(sigma_max), -0.5, probs.shape[1] - 0.5],
            )
            ax.set_xlabel("log10 sigma")
            ax.set_ylabel("expert")
            ax.set_title(f"{name} router specialization")
            fig.colorbar(im, ax=ax, label="gate prob")
        fig.tight_layout()
        out = self.out_dir / "02_expert_specialization.png"
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out

    # ------------------------------------------------------------------ 03
    def plot_scaling_gating(self) -> Optional[Path]:
        recs = self._stream("training")
        if not recs:
            return None
        fig, axes = plt.subplots(2, 2, figsize=(14, 9))
        ax = axes[0, 0]
        for key, label in (("scaling_vit_mean", "ViT"), ("scaling_unet_mean", "U-Net")):
            x, y = _col(recs, key)
            if len(y):
                ax.plot(x, y, label=label)
        ax.set_title("Path scaling factors (mean)")
        ax.legend(); ax.grid(alpha=0.3)
        ax = axes[0, 1]
        for key, label in (("gate_wx", "Wx (U-Net)"), ("gate_wa", "Wa (attn)")):
            x, y = _col(recs, key)
            if len(y):
                ax.plot(x, y, label=label)
        ax.set_title("Output gate weights")
        ax.legend(); ax.grid(alpha=0.3)
        ax = axes[1, 0]
        for key in ("scaling_vit_min", "scaling_vit_max", "scaling_unet_min", "scaling_unet_max"):
            x, y = _col(recs, key)
            if len(y):
                ax.plot(x, y, label=key, lw=0.8)
        ax.set_title("Scaling extrema"); ax.legend(fontsize=7); ax.grid(alpha=0.3)
        ax = axes[1, 1]
        x, y = _col(recs, "noise_level")
        if len(y):
            ax.plot(x, y, label="mean")
            _, ymin = _col(recs, "noise_level_min")
            _, ymax = _col(recs, "noise_level_max")
            if len(ymin) == len(y):
                ax.fill_between(x, ymin, ymax, alpha=0.2)
        ax.set_yscale("log")
        ax.set_title("Noise level sigma"); ax.grid(alpha=0.3)
        fig.suptitle(f"Scaling & gating — {self.run_name}")
        fig.tight_layout()
        out = self.out_dir / "03_scaling_gating.png"
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out

    # ------------------------------------------------------------------ 04
    def plot_gradient_flow(self) -> Optional[Path]:
        recs = self._stream("gradients")
        if not recs:
            return None
        keys = sorted({k for r in recs for k in r if k.endswith("_grad_norm")})
        fig, axes = plt.subplots(1, 2, figsize=(15, 5))
        ax = axes[0]
        summary = []
        for k in keys:
            x, y = _col(recs, k)
            if len(y):
                ax.plot(x, y, label=k.replace("_grad_norm", ""), lw=1.0)
                status = "EXPLODING" if y[-5:].mean() > 100 else ("VANISHING" if y[-5:].mean() < 1e-6 else "healthy")
                summary.append((k.replace("_grad_norm", ""), f"{y[-1]:.4f}", status))
        ax.set_yscale("log")
        ax.set_title("Per-component gradient norms")
        ax.legend(fontsize=8); ax.grid(alpha=0.3)
        ax = axes[1]
        ax.axis("off")
        if summary:
            table = ax.table(
                cellText=[list(s) for s in summary],
                colLabels=["component", "last grad norm", "status"],
                loc="center",
            )
            table.scale(1, 1.6)
        ax.set_title("Gradient health")
        fig.tight_layout()
        out = self.out_dir / "04_gradients.png"
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out

    # ------------------------------------------------------------------ 05
    def plot_fid_vs_nfe(self, records: Optional[List[dict]] = None) -> Optional[Path]:
        """FID vs number of denoiser evaluations — the reference's to-do
        item 6.3 (README.md:13, marked DONE there but never implemented:
        graphs/plotter.py has no FID plot). ``records`` are
        {"nfe": int, "fid": float, ...} dicts; defaults to the
        ``<run>_fid.jsonl`` stream (written by scripts/fid_vs_nfe.py)."""
        recs = records if records is not None else self._stream("fid")
        recs = [r for r in recs if "nfe" in r and "fid" in r]
        if not recs:
            return None
        recs = sorted(recs, key=lambda r: r["nfe"])
        # one curve per solver; records predating the solver knob are Heun
        solvers = sorted({r.get("solver", "heun") for r in recs})
        fig, ax = plt.subplots(figsize=(7, 5))
        for solver in solvers:
            rs = [r for r in recs if r.get("solver", "heun") == solver]
            nfe = np.asarray([r["nfe"] for r in rs], dtype=np.float64)
            fid = np.asarray([r["fid"] for r in rs], dtype=np.float64)
            ax.plot(nfe, fid, "o-", lw=1.5,
                    label=solver if len(solvers) > 1 else None)
            for x, y in zip(nfe, fid):
                ax.annotate(f"{y:.1f}", (x, y), textcoords="offset points",
                            xytext=(0, 8), fontsize=8, ha="center")
        if len(solvers) > 1:
            ax.legend(title="solver")
        nfe = np.asarray(sorted({r["nfe"] for r in recs}), dtype=np.float64)
        ax.set_xscale("log")
        ax.set_xticks(nfe)
        ax.get_xaxis().set_major_formatter(matplotlib.ticker.ScalarFormatter())
        ax.set_xlabel("NFE (denoiser evaluations)")
        tower = recs[-1].get("tower", "")
        ax.set_ylabel(f"FID{f' ({tower})' if tower else ''}")
        ax.set_title("Sample quality vs sampling compute")
        ax.grid(alpha=0.3)
        fig.tight_layout()
        out = self.out_dir / "05_fid_vs_nfe.png"
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out

    def plot_eval_trend(self) -> Optional[Path]:
        """In-training sample quality vs optimizer step, from the eval
        stream (train/evalhook.py writes ``<run>_eval.jsonl`` when
        RunConfig.eval_interval > 0). No reference analog — the reference
        cannot see quality until training ends."""
        recs = [r for r in self._stream("eval") if "fid" in r and "step" in r]
        if not recs:
            return None
        recs = sorted(recs, key=lambda r: r["step"])
        fig, ax = plt.subplots(figsize=(7, 5))
        for ema in sorted({bool(r.get("ema")) for r in recs}):
            rs = [r for r in recs if bool(r.get("ema")) == ema]
            ax.plot([r["step"] for r in rs], [r["fid"] for r in rs], "o-",
                    lw=1.5, label="EMA weights" if ema else "raw weights")
        ax.legend()
        tower = recs[-1].get("tower", "")
        n = recs[-1].get("n", "")
        ax.set_xlabel("optimizer step")
        ax.set_ylabel(f"FID@{n}{f' ({tower})' if tower else ''}")
        ax.set_title("Sample quality during training")
        ax.grid(alpha=0.3)
        fig.tight_layout()
        out = self.out_dir / "06_eval_trend.png"
        fig.savefig(out, dpi=110)
        plt.close(fig)
        return out

    def plot_all(self, router_probe=None) -> List[Path]:
        outs = [self.plot_training_dynamics(), self.plot_scaling_gating(),
                self.plot_gradient_flow(), self.plot_fid_vs_nfe(),
                self.plot_eval_trend()]
        if router_probe is not None:
            outs.append(self.plot_expert_specialization(router_probe))
        return [o for o in outs if o is not None]


def make_router_probe(params, model_cfg, batch_size: int = 8):
    """Build a ``router_probe`` for plot_expert_specialization from a live
    model: runs both routers over dummy inputs at each sigma (the reference
    sweeps 100 log-spaced sigmas with dummy images, plotter.py:244-268)."""
    import jax
    import jax.numpy as jnp

    from hdmoe_tpu.models.hdmoem import precond_apply

    @jax.jit
    def probe_one(sigma):
        x = jnp.zeros((1, model_cfg.img_resolution, model_cfg.img_resolution, model_cfg.in_channels))
        s = jnp.full((1, 1, 1, 1), sigma)
        mask = jnp.ones((1, model_cfg.num_experts))
        out = precond_apply(params, model_cfg, x, s, None, mask, mask, 0.0)
        return out["Unet_router_loss"][0], out["vit_router_loss"][0]

    def probe(sigmas):
        unet, vit = [], []
        for s in sigmas:
            u, v = probe_one(float(s))
            unet.append(np.asarray(u))
            vit.append(np.asarray(v))
        return np.stack(unet), np.stack(vit)

    return probe
