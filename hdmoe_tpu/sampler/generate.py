"""Inference entry: checkpoint -> EDM sampling -> decoded PNG grid.

Re-design of reference ``sample_and_save`` (Utils/training.py:273-345):
rebuild the model, restore weights, encode the fixed prompt once, run the
jitted Heun sampler (one XLA program for all steps), VAE-decode, save a PNG
grid + individual samples.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from hdmoe_tpu.adapters import make_text_encoder, make_vae
from hdmoe_tpu.models.configs import HDMOEMConfig
from hdmoe_tpu.models.hdmoem import precond_apply, precond_init
from hdmoe_tpu.sampler.edm import EDMSamplerConfig, make_denoiser
from hdmoe_tpu.sampler.dpm import make_sampler
from hdmoe_tpu.train.checkpoint import CheckpointManager
from hdmoe_tpu.train.optim import OptimConfig
from hdmoe_tpu.train.train_step import init_train_state


def save_image_grid(images: np.ndarray, path: str, nrow: int = 4) -> None:
    """uint8 NHWC batch -> single PNG grid (torchvision save_image analog)."""
    from PIL import Image

    b, h, w, c = images.shape
    ncol = (b + nrow - 1) // nrow
    grid = np.zeros((ncol * h, nrow * w, c), dtype=np.uint8)
    for i in range(b):
        r, col = divmod(i, nrow)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    Image.fromarray(grid.squeeze() if c == 1 else grid).save(path)


def sample_and_save(
    model_cfg: HDMOEMConfig,
    checkpoint_dir: Optional[str] = None,
    params: Optional[Any] = None,
    out_dir: str = "generated_samples_unguided",
    batch_size: int = 16,
    num_steps: int = 40,
    guidance: float = 1.0,
    prompt: str = "a photo of a flower",
    transition_mean: float = -1.2,
    softness: float = 1.2,
    vae_kind: str = "fake",
    text_kind: str = "fake",
    seed: int = 0,
    solver: str = "heun",
) -> np.ndarray:
    """Sample a batch and save grid + per-sample PNGs; returns the uint8 images."""
    key = jax.random.PRNGKey(seed)
    if params is None:
        if checkpoint_dir is None:
            raise ValueError("need checkpoint_dir or params")
        k_init, key = jax.random.split(key)
        abstract = init_train_state(
            jax.jit(lambda k: precond_init(k, model_cfg))(k_init), OptimConfig()
        )
        ckpt = CheckpointManager(checkpoint_dir)
        state, _, _ = ckpt.restore(abstract, key)
        params = state.params
        ckpt.close()

    clip = make_text_encoder(text_kind, width=model_cfg.text_emb_dim)
    vae = make_vae(vae_kind, target_std=model_cfg.sigma_data)
    text_emb = None
    if model_cfg.text_emb_dim > 0:
        text_emb = clip.encode_text([prompt] * batch_size)

    def precond_fn(x, sigma, text, m1, m2, zeta, transition_point, softness):
        return precond_apply(
            params, model_cfg, x, sigma, text, m1, m2, zeta,
            transition_point=transition_point, softness=softness,
        )

    denoiser = make_denoiser(
        precond_fn, model_cfg.num_experts, transition_mean, softness, guidance=guidance,
        uncond_text_emb=(clip.encode_text([""] * batch_size) if (guidance != 1.0 and text_emb is not None) else None),
    )
    scfg = EDMSamplerConfig(num_steps=num_steps, guidance=guidance)

    key, k_noise, k_churn = jax.random.split(key, 3)
    noise = jax.random.normal(
        k_noise, (batch_size, model_cfg.img_resolution, model_cfg.img_resolution, model_cfg.in_channels)
    )
    solve = make_sampler(solver)
    latents = jax.jit(lambda n, k: solve(denoiser, n, text_emb, scfg, key=k))(noise, k_churn)
    images = np.asarray(vae.decode(latents))

    os.makedirs(out_dir, exist_ok=True)
    save_image_grid(images, os.path.join(out_dir, "grid_unguided.png"))
    from PIL import Image

    for i, img in enumerate(images):
        Image.fromarray(img).save(os.path.join(out_dir, f"sample_{i}.png"))
    return images
