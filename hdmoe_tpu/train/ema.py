"""Exponential moving average of parameters.

The reference lists post-hoc EMA as an open TODO (README.md:8) and ships no
EMA at all; sampling quality in EDM-family models depends on it, so the
framework provides standard EMA as a first-class training feature (one fused
device-side lerp per step) with the usual warmup-corrected decay.

``EmaTracker`` also keeps optional periodic snapshots, the raw material for
Karras-style post-hoc EMA reconstruction (combining snapshots after training
to synthesize arbitrary EMA lengths).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp


@jax.jit
def ema_update(ema_params: Any, params: Any, decay) -> Any:
    """ema <- decay * ema + (1-decay) * params (single fused program)."""
    return jax.tree_util.tree_map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


def warmup_decay(base_decay: float, step: int) -> float:
    """Standard EMA warmup: min(base, (1+step)/(10+step)) — ramps from 0 so
    early steps don't freeze random init into the average."""
    return min(base_decay, (1.0 + step) / (10.0 + step))


class EmaTracker:
    """Host-side convenience wrapper: holds the EMA tree + snapshots."""

    def __init__(self, params: Any, decay: float = 0.9999, snapshot_every: int = 0):
        self.decay = decay
        # Deep-copy: the live param buffers may be donated to the jitted
        # train step; aliasing them here would leave EMA holding deleted
        # arrays after the first update.
        self.ema_params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        self.snapshot_every = snapshot_every
        self.snapshots: List[Tuple[int, Any]] = []

    def update(self, params: Any, step: int, steps_elapsed: int = 1) -> None:
        """Fold ``steps_elapsed`` optimizer steps into the average.

        With the device-side multi-step loop (train_loop steps_per_call > 1)
        the tracker sees params only every K steps; the equivalent per-call
        decay is ``d**K`` (same asymptotic averaging length as per-step EMA
        of decay d; the intermediate-params cross terms it skips are
        O((1-d)^2))."""
        d = warmup_decay(self.decay, step) ** max(1, steps_elapsed)
        self.ema_params = ema_update(self.ema_params, params, d)
        if self.snapshot_every and step > 0 and step % self.snapshot_every < max(1, steps_elapsed):
            self.snapshots.append((step, self.ema_params))
