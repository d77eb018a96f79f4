"""Frozen SD-VAE adapter for latent diffusion, TPU-native.

Re-design of reference ``StabilityVAE`` (Utils/VAE_CLIP.py:7-88): a frozen
stabilityai/sd-vae-ft-mse encode/decode pair running as an XLA inference
graph, with the same numeric contract:

- encode: uint8 [0,255] pixels -> reparameterized latent sample scaled by
  ``0.18215 * target_std`` so latents ~ N(0, sigma_data).
- decode: inverse scaling -> uint8 [0,255].

This environment has zero egress, so HuggingFace weights may be absent; the
adapter hierarchy is pluggable (mirroring the reference's MockDenoiser test
pattern):

- ``StabilityVAE``: real diffusers Flax AutoencoderKL, loaded from a local
  cache path (raises a clear error if weights are unavailable).
- ``FakeVAE``: deterministic stand-in with the same shape/stat contract
  (8x spatial downsample to 4 channels via fixed orthogonal projections,
  approximately invertible) for hermetic tests and smoke training.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class FakeVAE:
    """Deterministic VAE stand-in with the SD-VAE shape contract.

    encode: (B, H, W, 3) uint8 -> (B, H/8, W/8, 4) float32 ~ N(0, target_std)
    decode: approximate inverse (projection transpose), uint8 out.

    Latent channels 0-2 carry the per-color 8x8 block means (an area
    downsample, so decodes are visually meaningful images); channel 3 is a
    fixed random orthonormal direction. Linear, deterministic, and
    stat-preserving — what the training/sampling stack needs for hermetic
    end-to-end runs.
    """

    latent_channels = 4
    downsample = 8

    def __init__(self, target_std: float = 0.5, seed: int = 0):
        self.target_std = target_std
        rng = np.random.RandomState(seed)
        d = self.downsample
        block = d * d * 3
        # Columns 0-2: normalized per-color block-mean directions.
        base = np.zeros((block, 3), dtype=np.float32)
        # pixel layout within a block is (dy, dx, color) flattened
        for c in range(3):
            base[c::3, c] = 1.0 / np.sqrt(d * d)
        a = rng.randn(block, 1).astype(np.float32)
        a -= base @ (base.T @ a)  # orthogonalize against the mean directions
        a /= np.linalg.norm(a)
        self._proj = jnp.asarray(np.concatenate([base, a], axis=1))  # (192, 4)

    def init(self, device=None):
        return self

    def encode(self, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """uint8/float [0,255] NHWC pixels -> latents ~ N(0, target_std)."""
        x = x.astype(jnp.float32) / 127.5 - 1.0
        b, h, w, c = x.shape
        d = self.downsample
        x = x.reshape(b, h // d, d, w // d, d, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // d, w // d, d * d * c)
        # projection columns have unit norm => mean channels come out d*mean;
        # normalize to block means (std ~0.5 for natural content) and rescale
        # to target_std with a FIXED factor so encoding is batch-independent.
        lat = (x @ self._proj) / self.downsample * (self.target_std / 0.5)
        if key is not None:
            lat = lat + jax.random.normal(key, lat.shape) * 0.01 * self.target_std
        return lat

    def decode(self, lat: jnp.ndarray) -> jnp.ndarray:
        """latents -> uint8 [0,255] NHWC pixels."""
        b, hl, wl, c = lat.shape
        d = self.downsample
        x = (lat * (0.5 / self.target_std) * self.downsample) @ self._proj.T
        x = x.reshape(b, hl, wl, d, d, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hl * d, wl * d, 3)
        return jnp.clip((x + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


class IdentityVAE:
    """Pixel-space passthrough 'VAE' for non-latent configs (CIFAR-10 /
    64x64 pixel diffusion): encode maps uint8 [0,255] to zero-centered
    floats scaled so natural-image content lands near std=target_std; decode
    inverts. No spatial change, channels preserved.
    """

    downsample = 1

    def __init__(self, target_std: float = 0.5):
        self.target_std = target_std
        self._scale = target_std / 0.5

    def init(self, device=None):
        return self

    def encode(self, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        del key
        return (x.astype(jnp.float32) / 127.5 - 1.0) * self._scale

    def decode(self, lat: jnp.ndarray) -> jnp.ndarray:
        x = lat / self._scale
        return jnp.clip((x + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


class StabilityVAE:
    """Frozen SD-VAE (stabilityai/sd-vae-ft-mse) as an XLA inference graph.
    Matches reference VAE_CLIP.py:7-88 numerics: encode samples the posterior
    (reparameterization) then scales by ``0.18215 * target_std``; decode
    inverts.

    Weight loading tries, in order:
    1. the native JAX AutoencoderKL (adapters/vae_native.py) reading the
       torch-format diffusers checkpoint directly — no diffusers needed;
    2. diffusers FlaxAutoencoderKL (handles Flax-format directories).
    """

    def __init__(
        self,
        vae_name: str = "stabilityai/sd-vae-ft-mse",
        scale_factor: Optional[float] = None,
        target_std: float = 0.5,
        local_path: Optional[str] = None,
    ):
        self.vae_name = vae_name
        # None = "not user-chosen": default to the SD-1.x constant but let a
        # loaded checkpoint's own scaling_factor override it. An EXPLICIT
        # value — even 0.18215 itself — always wins (round-4 advisor
        # finding: the old sentinel comparison silently overrode a caller
        # who deliberately pinned 0.18215 on an SDXL-style checkpoint).
        self._scale_user_chosen = scale_factor is not None
        self.scale_factor = 0.18215 if scale_factor is None else scale_factor
        self.target_std = target_std
        self.enc_scaler = self.scale_factor * target_std
        self.local_path = local_path
        self._vae = None          # diffusers Flax module (fallback path)
        self._params = None
        self._native_cfg = None   # native path: (params, VAEConfig)

    def init(self, device=None):
        if self._vae is not None or self._native_cfg is not None:
            return self
        import os

        from hdmoe_tpu.adapters import vae_native

        src = self.local_path or self.vae_name
        native_err = None
        if os.path.isdir(src):
            try:
                self._params, self._native_cfg = vae_native.load_torch_vae_params(src)
                # honor the checkpoint's own scaling_factor (round-4 review
                # finding: an SDXL-style config.json declares 0.13025 —
                # scaling with the SD-1.x default would silently mis-scale
                # latents ~40%). An explicit constructor override wins.
                if not self._scale_user_chosen:
                    self.scale_factor = float(self._native_cfg.scaling_factor)
                    self.enc_scaler = self.scale_factor * self.target_std
                self._jit_encode = jax.jit(
                    lambda px: vae_native.vae_encode(self._params, self._native_cfg, px))
                self._jit_decode = jax.jit(
                    lambda lt: vae_native.vae_decode(self._params, self._native_cfg, lt))
                return self
            except Exception as e:
                native_err = e
        try:
            from diffusers import FlaxAutoencoderKL

            try:
                self._vae, self._params = FlaxAutoencoderKL.from_pretrained(src)
            except Exception:
                # torch-format weights (what the reference downloads,
                # VAE_CLIP.py:29): diffusers converts the state dict on load.
                self._vae, self._params = FlaxAutoencoderKL.from_pretrained(src, from_pt=True)
        except Exception as e:  # zero-egress env or missing weights
            raise RuntimeError(
                f"SD-VAE weights unavailable (native: {native_err}; diffusers: {e}); "
                f"use FakeVAE for hermetic runs, provide local_path to cached "
                f"weights, or run scripts/port_vae_clip.py / "
                f"scripts/synthesize_hf_checkpoints.py."
            ) from e
        return self

    def encode(self, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """uint8 [0,255] NHWC -> latents ~ N(0, target_std) via posterior sample."""
        self.init()
        pixels = x.astype(jnp.float32) / 127.5 - 1.0
        if key is None:
            key = jax.random.PRNGKey(0)
        if self._native_cfg is not None:
            mean, logvar = self._jit_encode(pixels)
            sampled = mean + jax.random.normal(key, mean.shape) * jnp.exp(0.5 * logvar)
            return sampled * self.enc_scaler
        nchw = pixels.transpose(0, 3, 1, 2)
        posterior = self._vae.apply({"params": self._params}, nchw, method=self._vae.encode)
        dist = posterior.latent_dist
        sampled = dist.mean + jax.random.normal(key, dist.mean.shape) * dist.std
        return sampled.transpose(0, 2, 3, 1) * self.enc_scaler

    def decode(self, lat: jnp.ndarray) -> jnp.ndarray:
        self.init()
        if self._native_cfg is not None:
            out = self._jit_decode(lat / self.enc_scaler)
            return jnp.clip((out + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        raw = (lat / self.enc_scaler).transpose(0, 3, 1, 2)
        out = self._vae.apply({"params": self._params}, raw, method=self._vae.decode).sample
        out = out.transpose(0, 2, 3, 1)
        return jnp.clip((out + 1.0) * 127.5, 0, 255).astype(jnp.uint8)


def make_vae(kind: str = "auto", target_std: float = 0.5, **kw):
    """'real' | 'fake' | 'none' (pixel passthrough) | 'auto' (real if
    weights load, else fake)."""
    if kind == "none":
        return IdentityVAE(target_std=target_std)
    if kind == "fake":
        return FakeVAE(target_std=target_std, **kw)
    if kind == "real":
        return StabilityVAE(target_std=target_std, **kw).init()
    try:
        return StabilityVAE(target_std=target_std, **kw).init()
    except Exception:
        return FakeVAE(target_std=target_std)
