"""Real SD-VAE / CLIP adapter tests — skipped unless local weights exist.

The reference actually runs these models (Utils/VAE_CLIP.py:29-46, 100-121);
this environment has zero egress, so the real-weight paths are gated on
``HDMOE_VAE_PATH`` / ``HDMOE_CLIP_PATH`` (or a populated HF cache). The
always-running contract tests pin the Fake<->Real API so the fakes cannot
silently drift from what the real adapters provide.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.adapters.clip import CLIPTextEmbedder, FakeCLIP
from hdmoe_tpu.adapters.vae import FakeVAE, StabilityVAE


def _hf_cached(repo: str) -> str | None:
    base = os.path.expanduser("~/.cache/huggingface/hub")
    d = os.path.join(base, "models--" + repo.replace("/", "--"))
    return d if os.path.isdir(d) else None


VAE_PATH = os.environ.get("HDMOE_VAE_PATH") or _hf_cached("stabilityai/sd-vae-ft-mse")
CLIP_PATH = os.environ.get("HDMOE_CLIP_PATH") or _hf_cached("openai/clip-vit-large-patch14")


# ---------------------------------------------------------------------------
# Always-running: fake <-> real API contract
# ---------------------------------------------------------------------------


def test_vae_contract_fake_matches_real_api():
    """FakeVAE and StabilityVAE expose the identical adapter surface, so the
    hermetic stack exercises exactly the calls the real path uses."""
    for attr in ("init", "encode", "decode"):
        assert callable(getattr(FakeVAE, attr)) and callable(getattr(StabilityVAE, attr))
    fake = FakeVAE(target_std=0.5)
    img = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    lat = fake.encode(img, key=jax.random.PRNGKey(0))
    assert lat.shape == (2, 8, 8, 4)  # SD-VAE contract: /8 spatial, 4 channels
    out = fake.decode(lat)
    assert out.shape == img.shape and out.dtype == jnp.uint8


def test_clip_contract_fake_matches_real_api():
    for attr in ("init", "encode_text"):
        assert callable(getattr(FakeCLIP, attr)) and callable(getattr(CLIPTextEmbedder, attr))
    emb = FakeCLIP().encode_text(["a photo of a flower", "x"])
    assert emb.shape == (2, 77, 768)  # CLIP-L/14 text tower contract


# ---------------------------------------------------------------------------
# Real weights (skipped unless available)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(VAE_PATH is None, reason="SD-VAE weights not available (set HDMOE_VAE_PATH)")
def test_real_vae_encode_decode_roundtrip():
    vae = StabilityVAE(local_path=VAE_PATH).init()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    lat = vae.encode(img, key=jax.random.PRNGKey(0))
    assert lat.shape == (2, 8, 8, 4)
    # reference scaling: latents ~ N(0, sigma_data=0.5) for natural images
    assert 0.05 < float(jnp.std(lat)) < 2.0
    out = vae.decode(lat)
    assert out.shape == img.shape and out.dtype == jnp.uint8


@pytest.mark.skipif(CLIP_PATH is None, reason="CLIP weights not available (set HDMOE_CLIP_PATH)")
def test_real_clip_embedding_contract():
    clip = CLIPTextEmbedder(local_path=CLIP_PATH).init()
    emb = clip.encode_text(["a photo of a flower", "a cat"])
    assert emb.shape == (2, 77, 768)
    # equal prompts -> equal embeddings; different -> different
    again = clip.encode_text(["a photo of a flower", "a photo of a flower"])
    np.testing.assert_allclose(np.asarray(again[0]), np.asarray(again[1]))
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))
