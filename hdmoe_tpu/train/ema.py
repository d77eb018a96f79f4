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

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def ema_update(ema_params: Any, params: Any, decay) -> Any:
    """ema <- decay * ema + (1-decay) * params (single fused program)."""
    return jax.tree_util.tree_map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


def warmup_decay(base_decay: float, step: int) -> float:
    """Standard EMA warmup: min(base, (1+step)/(10+step)) — ramps from 0 so
    early steps don't freeze random init into the average."""
    return min(base_decay, (1.0 + step) / (10.0 + step))


def sigma_rel_to_gamma(sigma_rel: float) -> float:
    """Solve sigma_rel^2 = (g+1) / ((g+2)^2 (g+3)) for the power-EMA
    exponent gamma (EDM2's parameterization of averaging-profile width:
    sigma_rel is the profile's relative standard deviation; 0.05 -> gamma
    ~= 16.97, 0.10 -> ~6.94)."""
    t = float(sigma_rel) ** 2
    # (g+2)^2 (g+3) t - (g+1) = 0  ->  cubic in g
    roots = np.roots([t, 7 * t, 16 * t - 1, 12 * t - 1])
    real = roots.real[(np.abs(roots.imag) < 1e-9) & (roots.real > 0)]
    assert len(real), f"no positive gamma for sigma_rel={sigma_rel}"
    return float(real.max())


@jax.jit
def _power_ema_update(ema_params: Any, params: Any, beta) -> Any:
    return jax.tree_util.tree_map(
        lambda e, p: e * beta + p * (1.0 - beta), ema_params, params)


def _profile_inner(gi: float, ti: float, gj: float, tj: float) -> float:
    """<p_i, p_j> for power profiles p_{g,t}(r) = (g+1) r^g / t^(g+1) on
    [0, t] (EDM2 appendix): closed form, no quadrature."""
    tmin = min(ti, tj)
    return ((gi + 1.0) * (gj + 1.0) * tmin ** (gi + gj + 1.0)
            / ((gi + gj + 1.0) * ti ** (gi + 1.0) * tj ** (gj + 1.0)))


class PowerEmaTracker:
    """Power-function EMA profiles + periodic snapshots: the raw material
    for POST-HOC EMA (Karras et al., EDM2) — synthesizing the EMA of ANY
    averaging length after training from a small set of stored averages.

    The reference lists post-hoc EMA as its open TODO (README.md:8). The
    round-3 measurement that motivated shipping it here: a classic-EMA
    decay of 0.9999 over a 2,800-step run scored FID 2.61 vs raw 1.42
    because its 10k-step horizon exceeded the run — the right averaging
    length is unknowable before training ends, which is exactly the
    problem post-hoc EMA solves.

    Tracks one average per gamma with the exact power-profile update
    beta_t = (1 - 1/t)^(gamma+1); ``snapshot(step)`` stores host copies.
    """

    def __init__(self, params: Any, gammas=(16.97, 6.94)):
        self.gammas = tuple(float(g) for g in gammas)
        self.emas = {g: jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
                     for g in self.gammas}
        self.snapshots: List[Tuple[float, float, Any]] = []  # (gamma, t, tree)

    def update(self, params: Any, step: int, steps_elapsed: int = 1) -> None:
        """Fold the params at optimizer step ``step`` (1-indexed time
        t=step+1) into every profile. With the multi-step loop the tracker
        sees params every K steps; beta compounds over the skipped window
        (the same O((1-beta)^2) cross-term approximation as EmaTracker)."""
        t = float(step + 1)
        for g in self.gammas:
            beta = 1.0
            for dt in range(max(1, steps_elapsed)):
                beta *= (1.0 - 1.0 / max(t - dt, 1.0)) ** (g + 1.0)
            self.emas[g] = _power_ema_update(self.emas[g], params, beta)

    def snapshot(self, step: int) -> None:
        t = float(step + 1)
        for g in self.gammas:
            host = jax.tree_util.tree_map(lambda x: np.asarray(x), self.emas[g])
            self.snapshots.append((g, t, host))


def save_power_snapshots(path: str, snapshots) -> None:
    """Persist (gamma, t, tree) snapshots to one .npz: trees are flattened
    with jax (structure stored per snapshot as a treedef string is not
    robust — instead all snapshots share the FIRST snapshot's structure,
    which holds by construction in PowerEmaTracker)."""
    import jax.flatten_util as fu

    assert snapshots, "nothing to save"
    flats = []
    for g, t, tree in snapshots:
        flat, _ = fu.ravel_pytree(tree)
        flats.append((g, t, np.asarray(flat)))
    np.savez(
        path,
        gammas=np.array([f[0] for f in flats]),
        ts=np.array([f[1] for f in flats]),
        flat=np.stack([f[2] for f in flats]),
    )


def load_power_snapshots(path: str, params_like) -> list:
    """Inverse of save_power_snapshots; ``params_like`` provides the pytree
    structure (e.g. a restored checkpoint's params)."""
    import jax.flatten_util as fu

    _, unravel = fu.ravel_pytree(params_like)
    z = np.load(path)
    return [(float(g), float(t), unravel(jnp.asarray(f)))
            for g, t, f in zip(z["gammas"], z["ts"], z["flat"])]


def posthoc_ema(snapshots, t_target: float, *, gamma: Optional[float] = None,
                sigma_rel: Optional[float] = None) -> Any:
    """Synthesize the power-EMA average with exponent ``gamma`` (or width
    ``sigma_rel``) at time ``t_target`` from stored snapshots.

    ``snapshots`` is a list of (gamma_i, t_i, param_tree). Solves the
    least-squares projection of the target profile onto the span of the
    snapshot profiles using the closed-form inner products, then combines
    the trees with the solved weights (EDM2 algorithm 3)."""
    assert (gamma is None) != (sigma_rel is None), "pass exactly one of gamma/sigma_rel"
    if gamma is None:
        gamma = sigma_rel_to_gamma(sigma_rel)
    n = len(snapshots)
    assert n >= 1, "need at least one snapshot"
    A = np.empty((n, n))
    b = np.empty(n)
    for i, (gi, ti, _) in enumerate(snapshots):
        b[i] = _profile_inner(gi, ti, gamma, float(t_target))
        for j, (gj, tj, _) in enumerate(snapshots):
            A[i, j] = _profile_inner(gi, ti, gj, tj)
    # tiny ridge for numerical safety: profiles of nearby t are collinear
    x = np.linalg.solve(A + 1e-12 * np.eye(n) * np.trace(A) / n, b)
    trees = [s[2] for s in snapshots]
    return jax.tree_util.tree_map(
        lambda *leaves: sum(w * np.asarray(l) for w, l in zip(x, leaves)), *trees)


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
