"""Sample-quality metrics: Fréchet distance in feature/latent space.

The reference has no quantitative sample evaluation (no FID anywhere,
SURVEY.md §6). This module provides the measurement machinery the "FID parity
@ 50k" north star needs:

- ``gaussian_stats``: streaming mean/covariance of feature batches;
- ``frechet_distance``: the standard FID formula
  ``|mu1-mu2|^2 + tr(S1 + S2 - 2 (S1 S2)^(1/2))``;
- ``latent_fid``: Fréchet distance between VAE-latent statistics of real and
  generated images — an Inception-free proxy that runs hermetically. With a
  real InceptionV3 feature extractor plugged into ``feature_fn`` the same
  code computes true FID.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np


def gaussian_stats(features: Iterable[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Mean and covariance over an iterable of (B, D) feature batches."""
    n = 0
    s = None
    ss = None
    for batch in features:
        b = np.asarray(batch, dtype=np.float64).reshape(len(batch), -1)
        if s is None:
            s = np.zeros(b.shape[1])
            ss = np.zeros((b.shape[1], b.shape[1]))
        n += b.shape[0]
        s += b.sum(axis=0)
        ss += b.T @ b
    assert n > 1, "need at least 2 samples"
    mu = s / n
    cov = (ss - n * np.outer(mu, mu)) / (n - 1)
    return mu, cov


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix via eigh."""
    vals, vecs = np.linalg.eigh((a + a.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray) -> float:
    """||mu1-mu2||^2 + tr(S1 + S2 - 2 sqrt(sqrt(S1) S2 sqrt(S1)))."""
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(cov1)
    covmean = _sqrtm_psd(s1_half @ cov2 @ s1_half)
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * np.trace(covmean))


def latent_fid(
    real_images: np.ndarray,
    generated_images: np.ndarray,
    vae,
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    batch: int = 64,
) -> float:
    """Fréchet distance between latent statistics of real vs generated uint8
    NHWC image sets. ``feature_fn`` overrides the default VAE-latent features
    (e.g. plug an Inception tower for true FID)."""
    import jax.numpy as jnp

    def default_features(imgs: np.ndarray) -> np.ndarray:
        lat = vae.encode(jnp.asarray(imgs))
        return np.asarray(lat).reshape(len(imgs), -1)

    fn = feature_fn or default_features

    def batches(imgs):
        for i in range(0, len(imgs), batch):
            yield fn(imgs[i : i + batch])

    mu_r, cov_r = gaussian_stats(batches(real_images))
    mu_g, cov_g = gaussian_stats(batches(generated_images))
    return frechet_distance(mu_r, cov_r, mu_g, cov_g)
