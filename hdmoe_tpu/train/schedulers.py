"""Exploration (zeta) annealing and curriculum specialization masks.

Re-design of reference Utils/utils.py:175-330 as pure, jit-friendly
functions. The zeta schedule and mask bandwidth are functions of the step and
can be evaluated host-side (python floats for logging) or traced (scalars
inside the jitted train step).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Zeta (router exploration noise) schedule — ZetaScheduler (utils.py:175-225)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ZetaSchedule:
    total_steps: int
    max_zeta: float
    min_zeta: float = 0.0
    strategy: str = "cos"  # 'cos' | 'exp'
    alpha: float = 4.0
    warmup_ratio: float = 0.05

    @property
    def warmup_steps(self) -> int:
        return int(self.total_steps * self.warmup_ratio)

    def __call__(self, step) -> float:
        return zeta_at_step(self, step)


def zeta_at_step(sched: ZetaSchedule, step) -> float:
    """Warmup hold at max, then half-cosine or exponential decay to min.

    Works on python ints (host) and traced scalars (device): all branches use
    jnp.where when ``step`` is traced.
    """
    ws = sched.warmup_steps
    decay_total = max(sched.total_steps - ws, 1)
    cur = jnp.clip(jnp.asarray(step) - ws, 0, decay_total)
    if sched.strategy == "cos":
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * cur / decay_total))
        zeta = sched.min_zeta + (sched.max_zeta - sched.min_zeta) * cosine
    elif sched.strategy == "exp":
        term = -sched.alpha * (cur - (sched.max_zeta / decay_total))
        term = jnp.clip(term, -10.0, 10.0)
        zeta = (sched.max_zeta - sched.min_zeta) * jnp.exp(term) + sched.min_zeta
        zeta = jnp.clip(zeta, sched.min_zeta, sched.max_zeta)
    else:
        raise ValueError(f"Unknown strategy: {sched.strategy}")
    zeta = jnp.where(jnp.asarray(step) < ws, sched.max_zeta, zeta)
    zeta = jnp.where(jnp.asarray(step) >= sched.total_steps, sched.min_zeta, zeta)
    if isinstance(step, (int, float)):
        return float(zeta)
    return zeta


# ---------------------------------------------------------------------------
# Curriculum specialization masks — MaskGenerator (utils.py:228-330)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MaskGenerator:
    """Rank-based attribute-aware expert specialization masks.

    Experts are ranked by their physical-scale attribute (kernel or patch
    size, stable sort) and assigned equidistant centers over ``noise_range``
    in sigma-percentile space (utils.py:258-277). A sample activates experts
    whose center is within the (step-scheduled) bandwidth of its sigma
    percentile; the nearest ``min_active`` experts are always forced on.
    """

    expert_attributes: Tuple[float, ...]
    p_mean: float = -0.4
    p_std: float = 1.0
    bandwidth: float = 0.3
    max_bandwidth: float = 0.9
    min_active: int = 1
    total_steps: int = 5000
    step_size: float = 0.1
    noise_range: Tuple[float, float] = (0.0, 1.0)
    strat_band: str = "step"  # 'step' | 'linear' | anything-else => constant

    @property
    def expert_centers(self) -> np.ndarray:
        attrs = np.asarray(self.expert_attributes, dtype=np.float32)
        order = np.argsort(attrs, kind="stable")
        pts = np.linspace(self.noise_range[0], self.noise_range[1], num=len(attrs), dtype=np.float32)
        centers = np.zeros_like(attrs)
        centers[order] = pts
        return centers

    def __call__(self, sigma: jnp.ndarray, step) -> jnp.ndarray:
        return specialization_mask(self, sigma, step)


def bandwidth_at_step(gen: MaskGenerator, step) -> float:
    """Bandwidth widening schedule (utils.py:311-330)."""
    step_arr = jnp.asarray(step, dtype=jnp.float32)
    if gen.strat_band == "linear":
        prog = step_arr / float(gen.total_steps)
        bw = gen.bandwidth + (gen.max_bandwidth - gen.bandwidth) * prog
    elif gen.strat_band == "step":
        interval_size = gen.total_steps * gen.step_size
        current_interval = jnp.floor(step_arr / interval_size)
        total_intervals = int(1.0 / gen.step_size)
        prog = jnp.minimum(current_interval / total_intervals, 1.0)
        bw = gen.bandwidth + (gen.max_bandwidth - gen.bandwidth) * prog
    else:
        bw = jnp.asarray(gen.bandwidth)
    bw = jnp.where(step_arr >= gen.total_steps, gen.max_bandwidth, bw)
    if isinstance(step, (int, float)):
        return float(bw)
    return bw


def specialization_mask(gen: MaskGenerator, sigma: jnp.ndarray, step) -> jnp.ndarray:
    """(B, E) binary mask from sigma percentiles (utils.py:281-309).

    Percentile via the log-normal CDF ``0.5*(1+erf((log s - p_mean)/(p_std*sqrt 2)))``,
    band test ``|percentile - center| <= bandwidth(step)``, plus the
    ``min_active`` nearest-expert safety valve. Pure and jittable; no
    gradient flows (inputs are stop_gradient-ed).
    """
    s = jax.lax.stop_gradient(sigma.reshape(-1))
    log_s = jnp.log(s)
    pct = 0.5 * (1.0 + jax.lax.erf((log_s - gen.p_mean) / (gen.p_std * math.sqrt(2.0))))
    pct = jnp.clip(pct, 0.0, 1.0)

    centers = jnp.asarray(gen.expert_centers)
    dist = jnp.abs(pct[:, None] - centers[None, :])
    bw = bandwidth_at_step(gen, step)
    mask = (dist <= bw).astype(jnp.float32)
    _, top_idx = jax.lax.top_k(-dist, gen.min_active)
    b = mask.shape[0]
    mask = mask.at[jnp.arange(b)[:, None], top_idx].set(1.0)
    return mask
