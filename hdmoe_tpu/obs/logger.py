"""JSONL training telemetry with the reference metric vocabulary.

Re-design of reference graphs/logger.py (4 JSONL streams: training, router
stats, gradients, weights) for the jitted-train-step world: the step function
returns one metrics dict + one aux dict per step (already reduced on device),
and the logger consumes those with a single host transfer — no parameter
iteration or ``.item()`` syncs in the hot loop (the reference does dozens per
step, training.py:162-194).

Metric vocabulary preserved (SURVEY.md §5): loss/denoising/balance/z_loss/
entropy/pure_loss, zeta, log_var, lr, avg_sigma_percentile; per-router
entropy/gini/max/min usage/dead_experts/usage_std/per-expert usage;
scaling_{vit,unet}_{mean,min,max}, gate_wx/gate_wa, noise_level stats;
per-component grad norms; weight mean/std/min/max.
"""

from __future__ import annotations

import json
import math
from collections import defaultdict
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def _to_float(v) -> float:
    return float(np.asarray(v))


@jax.jit
def _bank_weight_stats(tree):
    """Device-side mean/std/min/max over all >=2-D leaves of an expert bank.

    Returns four scalars; retraces once per bank pytree structure. fp32
    accumulation matches the reference's float64-on-host within the 6
    decimals the log stream rounds to."""
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if l.ndim > 1]
    if not leaves:
        z = jnp.zeros(())
        return {"mean": z, "std": z, "max": z, "min": z}
    count = sum(l.size for l in leaves)
    total = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    sq = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
    mean = total / count
    var = jnp.maximum(sq / count - mean**2, 0.0)
    return {
        "mean": mean,
        "std": jnp.sqrt(var),
        "max": jnp.stack([jnp.max(l) for l in leaves]).max(),
        "min": jnp.stack([jnp.min(l) for l in leaves]).min(),
    }


class Logger:
    """Four JSONL streams, interval-averaged like the reference
    (graphs/logger.py:36-67, 328-345)."""

    def __init__(self, log_dir: str = "./training_logs", run_name: str = "experiment",
                 log_interval: int = 10, step_stride: int = 1):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.run_name = run_name
        self.log_interval = log_interval
        # With the device-side multi-step loop (train_loop steps_per_call=K)
        # the logger only sees steps 0, K, 2K, ...; exact `% interval == 0`
        # gates would skip or stretch every stream whenever K doesn't divide
        # the interval. A gate fires when its window [n*interval,
        # n*interval+stride) contains the observed step.
        self.step_stride = max(1, int(step_stride))
        self.main_log_file = self.log_dir / f"{run_name}_training.jsonl"
        self.router_log_file = self.log_dir / f"{run_name}_router_stats.jsonl"
        self.gradient_log_file = self.log_dir / f"{run_name}_gradients.jsonl"
        self.weight_log_file = self.log_dir / f"{run_name}_weights.jsonl"
        self.eval_log_file = self.log_dir / f"{run_name}_eval.jsonl"
        self._acc: Dict[str, list] = defaultdict(list)

    # -- eval stream (in-training sample quality; no reference analog) -------

    def log_eval(self, step: int, record: Dict[str, Any]) -> None:
        """One un-averaged record per eval point (train/evalhook.py): FID,
        sample count, tower label, wall seconds."""
        self._write(self.eval_log_file, {"step": step, **record})

    # -- main training stream ------------------------------------------------

    def log_training_step(
        self,
        step: int,
        metrics: Dict[str, Any],
        lr: float,
        p_mean: float,
        p_std: float,
    ) -> None:
        """Accumulate scalars; flush an averaged record every ``log_interval``.

        ``metrics`` is the train-step output dict (loss terms + zeta/log_var/
        sigma stats/grad norms)."""
        self._acc["step"].append(step)
        for key in ("loss", "denoising", "balance", "z_loss", "entropy", "pure_loss", "zeta", "log_var"):
            if key in metrics:
                self._acc[key].append(_to_float(metrics[key]))
        self._acc["lr"].append(float(lr))
        if "sigma_mean" in metrics:
            # average sigma percentile under the training log-normal
            log_sigma = math.log(max(_to_float(metrics["sigma_mean"]), 1e-12))
            pct = 0.5 * (1.0 + math.erf((log_sigma - p_mean) / (p_std * math.sqrt(2.0))))
            self._acc["avg_sigma_percentile"].append(pct)
        if step % self.log_interval < self.step_stride and self._acc["step"]:
            self._flush_training()

    # -- router stream -------------------------------------------------------

    def log_router_statistics(
        self,
        step: int,
        unet_probs,
        vit_probs,
        sigma,
        p_mean: float,
        p_std: float,
    ) -> None:
        if step % self.log_interval >= self.step_stride:
            return
        unet = np.asarray(unet_probs)
        vit = np.asarray(vit_probs)
        s = np.asarray(sigma).reshape(-1)
        pct = 0.5 * (1.0 + np.vectorize(math.erf)((np.log(s) - p_mean) / (p_std * math.sqrt(2.0))))
        record = {"step": int(step), "avg_sigma_percentile": float(pct.mean())}
        for name, probs in (("unet", unet), ("vit", vit)):
            usage = probs.mean(axis=0)
            norm = usage / (usage.sum() + 1e-10)
            entropy = float(-np.sum(norm * np.log(norm + 1e-10)))
            sorted_u = np.sort(usage)
            n = len(sorted_u)
            cumsum = np.cumsum(sorted_u)
            gini = float(
                (2.0 * np.sum(np.arange(1, n + 1) * sorted_u)) / (n * cumsum[-1]) - (n + 1) / n
            )
            record.update(
                {
                    f"{name}_entropy": entropy,
                    f"{name}_gini": gini,
                    f"{name}_max_usage": float(usage.max()),
                    f"{name}_min_usage": float(usage.min()),
                    f"{name}_dead_experts": int((usage < 0.01).sum()),
                    f"{name}_usage_std": float(usage.std()),
                    f"{name}_expert_usage": usage.tolist(),
                }
            )
        self._write(self.router_log_file, record)

    # -- scaling / gating ----------------------------------------------------

    def log_scaling_gating(self, scaling_factors, gate_weights, sigma) -> None:
        sf = np.asarray(scaling_factors)
        gw = np.asarray(gate_weights)
        s = np.asarray(sigma).reshape(-1)
        a = self._acc
        a["scaling_vit_mean"].append(float(sf[:, 0].mean()))
        a["scaling_unet_mean"].append(float(sf[:, 1].mean()))
        a["scaling_vit_max"].append(float(sf[:, 0].max()))
        a["scaling_vit_min"].append(float(sf[:, 0].min()))
        a["scaling_unet_max"].append(float(sf[:, 1].max()))
        a["scaling_unet_min"].append(float(sf[:, 1].min()))
        a["gate_wx"].append(float(gw[:, 0].mean()))
        a["gate_wa"].append(float(gw[:, 1].mean()))
        a["noise_level"].append(float(s.mean()))
        a["noise_level_min"].append(float(s.min()))
        a["noise_level_max"].append(float(s.max()))
        a["noise_level_std"].append(float(s.std()))

    # -- gradient stream -----------------------------------------------------

    def log_gradients(self, step: int, metrics: Dict[str, Any]) -> None:
        """Write per-component grad norms computed inside the jitted step
        (train_step._component_grad_norms), keeping the reference's record
        shape ``{name}_grad_norm``."""
        if step % self.log_interval >= self.step_stride:
            return
        record = {"step": int(step)}
        for k, v in metrics.items():
            if k.endswith("_grad_norm"):
                record[k] = _to_float(v)
        if len(record) > 1:
            self._write(self.gradient_log_file, record)

    # -- weight stream -------------------------------------------------------

    def log_weight_statistics(self, step: int, params) -> None:
        """Mean/std/min/max for the expert banks every 50*log_interval steps
        (graphs/logger.py:267-326).

        The reduction runs ON DEVICE (jitted, cached on first call) and only
        four scalars per bank cross to the host. The previous host-side
        ``np.asarray`` pass fetched the whole param tree and ran float64
        numpy over it — measured as discrete multi-second training stalls on
        the tunnel-attached chip (PERF.md round-3 feed findings)."""
        if step % (self.log_interval * 50) >= self.step_stride:
            return
        net = params.get("net", params)
        record = {"step": int(step)}
        stats_by_key = {}
        for key in ("unet_experts", "vit_experts"):
            # the >=2-D check is host-side pytree metadata — no transfer
            if key in net and any(
                    getattr(l, "ndim", 0) > 1 for l in jax.tree_util.tree_leaves(net[key])):
                stats_by_key[key] = _bank_weight_stats(net[key])
        # one blocking transfer for all scalars (not one sync per stat)
        stats_by_key = jax.device_get(stats_by_key)
        for log_name, key in (("Unet_experts", "unet_experts"), ("VIT_experts", "vit_experts")):
            if key not in net:
                continue
            st = stats_by_key.get(key)
            if st is None:  # bank exists but has no >=2-D leaves
                record[f"{log_name}_weight_mean"] = None
                continue
            record[f"{log_name}_weight_mean"] = round(float(st["mean"]), 6)
            record[f"{log_name}_weight_std"] = round(float(st["std"]), 6)
            record[f"{log_name}_weight_max"] = round(float(st["max"]), 6)
            record[f"{log_name}_weight_min"] = round(float(st["min"]), 6)
        self._write(self.weight_log_file, record)

    # -- internals -----------------------------------------------------------

    def _flush_training(self) -> None:
        record = {"step": int(self._acc["step"][-1])}
        for key, vals in self._acc.items():
            if key == "step" or not vals:
                continue
            record[key] = round(float(np.mean(vals)), 6)
        self._write(self.main_log_file, record)
        self._acc.clear()

    @staticmethod
    def _write(path: Path, record: Dict[str, Any]) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")
