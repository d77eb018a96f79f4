"""On-device data augmentation for diffusion training (reference TODO 3).

The reference README lists "data augmentation pipeline" as its open roadmap
item 3 (reference README.md:6-7) with nothing implemented. This is the
TPU-first realization: a pure, jittable, per-sample-random pixel transform
that runs INSIDE the compiled program, immediately before the frozen-VAE
encode — zero host work, composes with ``dataset="synthetic-device"`` and
the K-step dispatch loop, and shards batch-elementwise under GSPMD like the
rest of the feed path.

Design constraints that shaped it:

- **Static shapes**: translations are pad + per-sample ``dynamic_slice``
  (vmapped), never data-dependent shapes; rot90 materializes all four
  rotations and gathers per sample (4x a pixel batch is ~100 MB at the
  flagship scale — noise next to one train step).
- **Pixel space, not latent space**: geometric transforms do not commute
  with the VAE, so augmentation must run before ``vae.encode``
  (train_loop applies it there for the host-fed path and inside
  ``_latents_fn`` for the device-gen path).
- **Augmentations are leaky by default** (the model sees flipped/shifted
  data without a conditioning label); the default recipe is the
  conservative photo set — hflip + small translate — with everything else
  opt-in via probabilities.

All randomness comes from the explicit ``key``; ``p=0`` ops compile away to
identity (``jnp.where`` on a constant-false mask is elided by XLA).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    """Per-op application probabilities / magnitudes (0 disables an op)."""

    hflip: float = 0.5          # probability of a horizontal mirror
    vflip: float = 0.0          # probability of a vertical mirror (off: photos)
    rot90: float = 0.0          # probability of a random 90/180/270 rotation
    translate: float = 0.125    # max shift as a fraction of H/W (edge-padded)
    brightness: float = 0.0     # max additive shift as a fraction of 255
    contrast: float = 0.0       # max log-scale around the pixel midpoint

    @property
    def enabled(self) -> bool:
        return any(
            v > 0.0
            for v in (self.hflip, self.vflip, self.rot90, self.translate,
                      self.brightness, self.contrast)
        )


def augment_batch(key: jax.Array, pixels: jnp.ndarray, cfg: AugmentConfig) -> jnp.ndarray:
    """Apply the configured ops to a (B, H, W, C) uint8/float [0,255] batch.

    Returns float32 in [0, 255] (the VAE adapters accept either). Every op
    draws per-sample randomness from ``key``; two calls with the same key
    and input are bit-identical.
    """
    if not cfg.enabled:
        return pixels
    x = pixels.astype(jnp.float32)
    b, h, w, c = x.shape
    k_hf, k_vf, k_rot, k_rotk, k_ty, k_tx, k_br, k_co = jax.random.split(key, 8)

    if cfg.hflip > 0.0:
        m = jax.random.bernoulli(k_hf, cfg.hflip, (b, 1, 1, 1))
        x = jnp.where(m, x[:, :, ::-1, :], x)
    if cfg.vflip > 0.0:
        m = jax.random.bernoulli(k_vf, cfg.vflip, (b, 1, 1, 1))
        x = jnp.where(m, x[:, ::-1, :, :], x)
    if cfg.rot90 > 0.0:
        assert h == w, "rot90 augmentation needs square images"
        # all four rotations, gathered per sample: k=0 identity, else 90k CCW
        rots = jnp.stack(
            [x, jnp.rot90(x, 1, (1, 2)), jnp.rot90(x, 2, (1, 2)), jnp.rot90(x, 3, (1, 2))]
        )  # (4, B, H, W, C)
        apply = jax.random.bernoulli(k_rot, cfg.rot90, (b,))
        kk = jnp.where(apply, jax.random.randint(k_rotk, (b,), 1, 4), 0)
        x = jnp.take_along_axis(rots, kk[None, :, None, None, None], axis=0)[0]
    if cfg.translate > 0.0:
        ty_max = max(1, int(round(h * cfg.translate)))
        tx_max = max(1, int(round(w * cfg.translate)))
        ty = jax.random.randint(k_ty, (b,), -ty_max, ty_max + 1)
        tx = jax.random.randint(k_tx, (b,), -tx_max, tx_max + 1)
        padded = jnp.pad(
            x, ((0, 0), (ty_max, ty_max), (tx_max, tx_max), (0, 0)), mode="edge"
        )

        def shift(img, dy, dx):
            return jax.lax.dynamic_slice(img, (ty_max + dy, tx_max + dx, 0), (h, w, c))

        x = jax.vmap(shift)(padded, ty, tx)
    if cfg.contrast > 0.0:
        # log-uniform scale around the midpoint: identity in expectation
        s = jnp.exp(jax.random.uniform(k_co, (b, 1, 1, 1), minval=-cfg.contrast,
                                       maxval=cfg.contrast))
        x = (x - 127.5) * s + 127.5
    if cfg.brightness > 0.0:
        d = jax.random.uniform(k_br, (b, 1, 1, 1), minval=-cfg.brightness,
                               maxval=cfg.brightness) * 255.0
        x = x + d
    return jnp.clip(x, 0.0, 255.0)
