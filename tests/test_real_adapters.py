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
# Synthesized HF-format checkpoints (ALWAYS run): random weights, exact
# on-disk format/key layout of the real ones — so the weight-port path
# (loaders + scripts/port_vae_clip.py) is executed code, not gated code.
# The real-weight tests below stay gated for true weights.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from scripts.synthesize_hf_checkpoints import synth_clip, synth_vae

    root = tmp_path_factory.mktemp("synth_weights")
    return {
        "vae": synth_vae(str(root / "vae"), small=True),
        "clip": synth_clip(str(root / "clip"), small=True),
    }


def test_synth_vae_through_real_adapter(synth_dir):
    """StabilityVAE loads the diffusers-format checkpoint via the native
    JAX AutoencoderKL (no diffusers in this env) and honors the encode/
    decode contract end to end."""
    vae = StabilityVAE(local_path=synth_dir["vae"]).init()
    assert vae._native_cfg is not None  # native loader, not diffusers
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    lat = vae.encode(img, key=jax.random.PRNGKey(0))
    down = 2 ** (len(vae._native_cfg.block_out_channels) - 1)
    assert lat.shape == (2, 64 // down, 64 // down, 4)
    assert bool(jnp.isfinite(lat).all())
    again = vae.encode(img, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(lat), np.asarray(again))
    out = vae.decode(lat)
    assert out.shape == img.shape and out.dtype == jnp.uint8


def test_synth_clip_through_real_adapter(synth_dir):
    """CLIPTextEmbedder loads the torch-format transformers checkpoint
    (framework conversion on load) and honors the (B, 77, 768) contract."""
    clip = CLIPTextEmbedder(local_path=synth_dir["clip"]).init()
    emb = clip.encode_text(["a photo of a flower", "a cat"])
    assert emb.shape == (2, 77, 768)
    again = clip.encode_text(["a photo of a flower", "a photo of a flower"])
    np.testing.assert_allclose(np.asarray(again[0]), np.asarray(again[1]))
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))


def test_port_script_clip_end_to_end(synth_dir, tmp_path):
    """scripts/port_vae_clip.py port_clip + verify_clip on the synthesized
    source: the ported Flax tower must match the torch tower numerically
    (verify_clip asserts max abs diff < 1e-3 internally)."""
    from scripts.port_vae_clip import port_clip, verify_clip

    out = str(tmp_path / "ported_clip")
    port_clip(synth_dir["clip"], out)
    verify_clip(synth_dir["clip"], out)
    emb = CLIPTextEmbedder(local_path=out).init().encode_text(["x"])
    assert emb.shape == (1, 77, 768)


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
