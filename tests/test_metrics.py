"""Fréchet-distance metric tests with mathematical oracles."""

import numpy as np
import pytest

from hdmoe_tpu.obs.metrics import frechet_distance, gaussian_stats, latent_fid


def test_gaussian_stats():
    rng = np.random.RandomState(0)
    data = rng.randn(5000, 4) * np.array([1.0, 2.0, 0.5, 1.5]) + np.array([0.0, 1.0, -1.0, 3.0])
    mu, cov = gaussian_stats([data[:2500], data[2500:]])
    np.testing.assert_allclose(mu, [0.0, 1.0, -1.0, 3.0], atol=0.1)
    np.testing.assert_allclose(np.diag(cov), [1.0, 4.0, 0.25, 2.25], rtol=0.15)


def test_frechet_identity_is_zero():
    rng = np.random.RandomState(1)
    a = rng.randn(8, 8)
    cov = a @ a.T + np.eye(8)
    mu = rng.randn(8)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_mean_shift_oracle():
    """Same covariance, shifted mean: FD = ||shift||^2 exactly."""
    cov = np.eye(4)
    mu1 = np.zeros(4)
    mu2 = np.array([3.0, 0.0, 4.0, 0.0])  # |shift|^2 = 25
    np.testing.assert_allclose(frechet_distance(mu1, cov, mu2, cov), 25.0, rtol=1e-8)


def test_frechet_isotropic_scale_oracle():
    """Zero means, cov s1*I vs s2*I in d dims: FD = d*(sqrt(s1)-sqrt(s2))^2."""
    d = 6
    fd = frechet_distance(np.zeros(d), 4.0 * np.eye(d), np.zeros(d), 1.0 * np.eye(d))
    np.testing.assert_allclose(fd, d * (2.0 - 1.0) ** 2, rtol=1e-8)


def test_latent_fid_smaller_for_matched_sets():
    from hdmoe_tpu.adapters import FakeVAE
    from hdmoe_tpu.train.data import SyntheticDataset

    ds = SyntheticDataset(resolution=32, seed=0)
    real = np.stack([ds.get(i) for i in range(48)])
    similar = np.stack([ds.get(i) for i in range(48, 96)])  # same distribution
    noise = (np.random.RandomState(0).rand(48, 32, 32, 3) * 255).astype(np.uint8)

    vae = FakeVAE()
    fid_similar = latent_fid(real, similar, vae, batch=16)
    fid_noise = latent_fid(real, noise, vae, batch=16)
    assert fid_similar < fid_noise
    assert fid_similar >= 0.0
