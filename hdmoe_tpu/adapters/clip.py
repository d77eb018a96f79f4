"""Frozen CLIP text-encoder adapter, TPU-native.

Re-design of reference ``CLIP_EMBED`` (Utils/VAE_CLIP.py:90-137): tokenize
with pad-to-77 and return the (B, 77, 768) last hidden state from a frozen
openai/clip-vit-large-patch14 text tower as an XLA inference graph.

Because the fixed-prompt embedding is time-invariant, callers should encode
once and reuse (the reference re-encodes the SAME prompt every training step,
training.py:143 — a pure waste this design removes; see
train/train_loop.py).

``FakeCLIP`` provides a deterministic hash-seeded embedding with the same
shape/stat contract for hermetic (zero-egress) runs.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class FakeCLIP:
    """Deterministic CLIP text-tower stand-in: (B, 77, 768) embeddings.

    Each prompt hashes to a PRNG seed; embeddings are unit-variance normal
    draws, constant across calls — preserving the contract that equal prompts
    give equal embeddings and different prompts give (almost surely)
    different ones.
    """

    def __init__(self, seq_len: int = 77, width: int = 768):
        self.seq_len = seq_len
        self.width = width

    def init(self, device=None):
        return self

    def encode_text(self, prompts: List[str]) -> jnp.ndarray:
        out = np.empty((len(prompts), self.seq_len, self.width), dtype=np.float32)
        for i, p in enumerate(prompts):
            seed = int.from_bytes(hashlib.sha256(p.encode()).digest()[:4], "little")
            rng = np.random.RandomState(seed)
            out[i] = rng.randn(self.seq_len, self.width).astype(np.float32)
        return jnp.asarray(out)


class CLIPTextEmbedder:
    """Frozen transformers Flax CLIP text model (openai/clip-vit-large-patch14)."""

    def __init__(self, embed_name: str = "openai/clip-vit-large-patch14", local_path: Optional[str] = None):
        self.embed_name = embed_name
        self.local_path = local_path
        self.tokenizer = None
        self.model = None

    def init(self, device=None):
        if self.tokenizer is not None:
            return self
        try:
            from transformers import CLIPTokenizer, FlaxCLIPTextModel

            src = self.local_path or self.embed_name
            self.tokenizer = CLIPTokenizer.from_pretrained(src)
            try:
                self.model = FlaxCLIPTextModel.from_pretrained(src)
            except Exception:
                # torch-format weights (what the reference downloads,
                # VAE_CLIP.py:100): transformers converts on load.
                self.model = FlaxCLIPTextModel.from_pretrained(src, from_pt=True)
        except Exception as e:
            raise RuntimeError(
                f"CLIP weights unavailable ({e}); use FakeCLIP for hermetic runs, "
                f"provide local_path to cached weights, or run "
                f"scripts/port_vae_clip.py to convert a torch checkpoint."
            ) from e
        return self

    def encode_text(self, prompts: List[str]) -> jnp.ndarray:
        self.init()
        toks = self.tokenizer(
            prompts,
            padding="max_length",
            max_length=self.tokenizer.model_max_length,
            truncation=True,
            return_tensors="np",
        )
        out = self.model(input_ids=toks["input_ids"])
        return jnp.asarray(out.last_hidden_state)


def make_text_encoder(kind: str = "auto", width: int = 768, seq_len: int = 77, **kw):
    """'real' | 'fake' | 'auto' (real if weights load, else fake)."""
    if kind == "fake":
        return FakeCLIP(seq_len=seq_len, width=width)
    if kind == "real":
        return CLIPTextEmbedder(**kw).init()
    try:
        return CLIPTextEmbedder(**kw).init()
    except Exception:
        return FakeCLIP(seq_len=seq_len, width=width)
