"""Synthesize HF-format SD-VAE / CLIP checkpoints (random weights).

The reference downloads real stabilityai/sd-vae-ft-mse and
openai/clip-vit-large-patch14 weights (/root/reference/Utils/VAE_CLIP.py:29,
:100); this environment has zero egress, so the real files can never arrive —
which previously left the whole port path (scripts/port_vae_clip.py, the
StabilityVAE / CLIPTextEmbedder weight loaders) as never-executed code.

This script closes that gap hermetically: it writes checkpoints with the
EXACT on-disk format and key layout of the real ones but random weights —

- VAE: a diffusers-format directory (``config.json`` +
  ``diffusion_pytorch_model.safetensors``) with the full sd-vae-ft-mse
  state-dict key set (vae_native.sd_vae_state_shapes is the source of
  truth, asserted against expected_sd_vae_keys).
- CLIP: a transformers-format directory (torch ``model.safetensors`` +
  tokenizer files) for a CLIP text tower at the contract width (768 /
  77 positions), with a minimal byte-level BPE vocabulary.

so the port scripts and adapters run end-to-end against them, and
tests/test_real_adapters.py-style assertions execute ungated. The real-HF-
weights gate remains for true weights.

Usage:
  python scripts/synthesize_hf_checkpoints.py --out /tmp/synth_weights [--small]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_vae_state(cfg, seed: int = 0, bias: str = "zeros") -> dict:
    """Random torch-layout SD-VAE state dict for ``cfg`` — the ONE place
    that knows the norm/bias/conv key-classification rule (shared with
    tests/test_vae_native.py so the synthesized checkpoints and the test's
    torch-mirror comparison cannot drift apart; round-4 review finding).

    ``bias="randn"`` gives small nonzero biases so bias-handling bugs
    can't hide (the tests' choice); "zeros" matches the script's
    checkpoints."""
    import numpy as np

    from hdmoe_tpu.adapters.vae_native import sd_vae_state_shapes

    rng = np.random.RandomState(seed)
    state = {}
    for k, shp in sorted(sd_vae_state_shapes(cfg).items()):
        last = k.rsplit(".", 2)[-2]
        if k.endswith(".weight") and ("norm" in last):
            state[k] = np.ones(shp, dtype=np.float32)
        elif k.endswith(".bias"):
            state[k] = (np.zeros(shp, dtype=np.float32) if bias == "zeros"
                        else (rng.randn(*shp) * 0.01).astype(np.float32))
        else:
            state[k] = (rng.randn(*shp) * 0.05).astype(np.float32)
    return state


def synth_vae(out: str, small: bool = False, seed: int = 0) -> str:
    from safetensors.numpy import save_file

    from hdmoe_tpu.adapters.vae_native import VAEConfig

    cfg = (VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                     norm_num_groups=8)
           if small else VAEConfig())
    state = synth_vae_state(cfg, seed=seed, bias="zeros")
    os.makedirs(out, exist_ok=True)
    save_file(state, os.path.join(out, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({
            "_class_name": "AutoencoderKL",
            "in_channels": cfg.in_channels,
            "out_channels": cfg.out_channels,
            "block_out_channels": list(cfg.block_out_channels),
            "layers_per_block": cfg.layers_per_block,
            "latent_channels": cfg.latent_channels,
            "norm_num_groups": cfg.norm_num_groups,
            "scaling_factor": cfg.scaling_factor,
        }, f, indent=2)
    print(f"[synth-vae] {len(state)} tensors -> {out} "
          f"(blocks {cfg.block_out_channels})")
    return out


def synth_clip(out: str, small: bool = False, seed: int = 0) -> str:
    """Torch-format CLIP text model + minimal BPE tokenizer.

    hidden=768 / 77 positions always (the adapter contract); ``small``
    shrinks depth, not width, so contract tests stay meaningful.
    """
    import tempfile

    import torch
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTokenizer
    from transformers.models.clip.tokenization_clip import bytes_to_unicode

    os.makedirs(out, exist_ok=True)
    # --- tokenizer: byte-level chars, empty merge table ---------------------
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    for s in ("<|startoftext|>", "<|endoftext|>"):
        vocab[s] = len(vocab)
    with tempfile.TemporaryDirectory() as td:
        vf = os.path.join(td, "vocab.json")
        mf = os.path.join(td, "merges.txt")
        with open(vf, "w") as f:
            json.dump(vocab, f)
        with open(mf, "w") as f:
            f.write("#version: 0.2\n")
        tok = CLIPTokenizer(vf, mf)
        tok.model_max_length = 77
        tok.save_pretrained(out)

    # --- model: torch save so the from_pt conversion path is exercised -----
    cfg = CLIPTextConfig(
        vocab_size=len(vocab),
        hidden_size=768,
        intermediate_size=1024 if small else 3072,
        num_hidden_layers=2 if small else 12,
        num_attention_heads=12,
        max_position_embeddings=77,
        bos_token_id=vocab["<|startoftext|>"],
        eos_token_id=vocab["<|endoftext|>"],
        pad_token_id=vocab["<|endoftext|>"],
    )
    torch.manual_seed(seed)
    model = CLIPTextModel(cfg)
    model.save_pretrained(out, safe_serialization=True)
    n = sum(p.numel() for p in model.parameters())
    print(f"[synth-clip] {n/1e6:.1f}M params (layers={cfg.num_hidden_layers}) -> {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_weights")
    ap.add_argument("--small", action="store_true",
                    help="reduced depth/channels (tests); width contract unchanged")
    ap.add_argument("--skip-vae", action="store_true")
    ap.add_argument("--skip-clip", action="store_true")
    args = ap.parse_args()
    if not args.skip_vae:
        synth_vae(os.path.join(args.out, "vae"), small=args.small)
    if not args.skip_clip:
        synth_clip(os.path.join(args.out, "clip"), small=args.small)
    print(f"done. point HDMOE_VAE_PATH={args.out}/vae HDMOE_CLIP_PATH={args.out}/clip "
          "(tests/test_real_adapters.py un-skips) or run scripts/port_vae_clip.py "
          "against these sources.")


if __name__ == "__main__":
    main()
