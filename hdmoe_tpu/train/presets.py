"""Configuration presets for the benchmark configs of record.

One builder per BASELINE.json config:

1. ``cifar10_pixel_config1``   — model_config1 unguided pixel-space MoE
   denoiser, CIFAR-10 32x32 (CPU-runnable)
2. ``heterogeneous_config2``   — config2 heterogeneous experts with
   zeta-scheduled routing, unguided 32x32 pixels
3. ``text_guided_64``          — CLIP text-guided diffusion with CFG,
   64x64 pixel space
4. ``latent_256_clip``         — SD-VAE latent diffusion at 256x256 with
   CLIP conditioning (the reference config of record)
5. ``moedit_64expert_ep``      — scaled MoE-DiT variant: 64 stacked experts
   sharded over the mesh expert axis (v5e-16 stretch)
"""

from __future__ import annotations

from typing import Any, Dict

from hdmoe_tpu.models.configs import default_model_config
from hdmoe_tpu.parallel.mesh import MeshConfig
from hdmoe_tpu.train.loss import EDMLossConfig
from hdmoe_tpu.train.optim import OptimConfig
from hdmoe_tpu.train.train_loop import RunConfig


def _mask_cfg(unet_attr, vit_attr) -> Dict[str, Any]:
    return {
        "unet_attr": list(unet_attr), "vit_attr": list(vit_attr),
        "p_mean": -1.2, "p_std": 1.6, "BW": 0.3, "max_BW": 0.8,
        "min_active": 1, "step_size": 0.1, "strat_band": "step",
        "unet_noise_range": (0.0, 0.6), "vit_noise_range": (0.4, 1.0),
    }


def cifar10_pixel_config1(total_steps: int = 5000):
    """Unguided pixel-space CIFAR-10 32x32, config1 variant (learned
    Scaling_router + dynamic query/context swap)."""
    model = default_model_config(
        in_channels=3, img_resolution=32, text_emb_dim=0, variant="config1",
    )
    optim = OptimConfig(total_schedule_steps=total_steps)
    loss = EDMLossConfig(num_experts=model.num_experts, unet_bal=0.05, vit_bal=0.1, z_bal=0.005)
    run = RunConfig(
        dataset="cifar10", data_img_res=32, vae="none", text_encoder="fake",
        total_steps=total_steps, save_dir="./checkpoints/cifar10_config1",
        run_name="cifar10_config1",
    )
    return model, optim, loss, _mask_cfg([3, 3, 5, 5], [4, 8, 8, 16]), run


def heterogeneous_config2(total_steps: int = 5000):
    """Unguided 32x32 pixels, config2 analytic path schedule."""
    model = default_model_config(in_channels=3, img_resolution=32, text_emb_dim=0)
    optim = OptimConfig(total_schedule_steps=total_steps)
    loss = EDMLossConfig(num_experts=model.num_experts, unet_bal=0.05, vit_bal=0.1, z_bal=0.005)
    run = RunConfig(
        dataset="synthetic-native", data_img_res=32, vae="none",
        total_steps=total_steps, save_dir="./checkpoints/hetero_config2",
        run_name="hetero_config2",
    )
    return model, optim, loss, _mask_cfg([3, 3, 5, 5], [4, 8, 8, 16]), run


def text_guided_64(total_steps: int = 5000):
    """CLIP text-guided 64x64 pixel-space diffusion (sample with CFG)."""
    model = default_model_config(
        in_channels=3, img_resolution=64, internal_channels=48, text_emb_dim=768,
        vit_patch_sizes=(4, 8, 8, 16),
        # fusion attention runs at seq 64^2=4096: the Pallas flash kernel
        # halves the denoiser eval on v5e (42.7 -> 21.5 ms, measured)
        use_flash=True,
    )
    optim = OptimConfig(total_schedule_steps=total_steps)
    loss = EDMLossConfig(num_experts=model.num_experts, unet_bal=0.05, vit_bal=0.1, z_bal=0.005)
    run = RunConfig(
        dataset="synthetic-native", data_img_res=64, vae="none", text_encoder="fake",
        total_steps=total_steps, save_dir="./checkpoints/text64",
        run_name="text_guided_64",
    )
    return model, optim, loss, _mask_cfg([3, 3, 5, 5], [4, 8, 8, 16]), run


def latent_256_clip(total_steps: int = 5000):
    """SD-VAE 256x256 latent diffusion with CLIP conditioning — the reference
    config of record (Utils/configs.py)."""
    model = default_model_config(
        # flash = the same exact softmax attention, fused: the round-3
        # train-step A/B measured 53.6 -> 47.0 ms/step (+12%) with losses
        # identical to 4 decimals after 1248 steps
        # (artifacts/train_step_dtype_r3.json); bf16_flash (42.4 ms, +26%)
        # stays opt-in via compute_dtype.
        use_flash=True,
    )
    optim = OptimConfig(total_schedule_steps=total_steps)
    loss = EDMLossConfig(num_experts=model.num_experts, unet_bal=0.05, vit_bal=0.1, z_bal=0.005)
    run = RunConfig(
        dataset="synthetic-native", data_img_res=256, vae="auto", text_encoder="auto",
        total_steps=total_steps, save_dir="./checkpoints/latent256",
        run_name="latent_256_clip",
        # augment stays None so canonical runs remain bit-comparable across
        # rounds; for quality, AugmentConfig() (hflip 0.5 + translate 0.125)
        # measured FID@5k 1.258 vs 1.424 control at matched 2,800 steps
        # (artifacts/augment_ab_r3/RESULTS.json) — pass run.augment or
        # `train --augment` to adopt it.
    )
    return model, optim, loss, _mask_cfg([3, 3, 5, 5], [4, 8, 8, 16]), run


def moedit_64expert_ep(total_steps: int = 5000, mesh: MeshConfig = MeshConfig(data=1, model=1, expert=16)):
    """64 HETEROGENEOUS experts with expert-parallel sharding (v5e-16
    stretch): experts keep per-expert kernel/patch sizes — the reference's
    defining feature (model_config1.py:152-177) — via shape-class banks
    (two 32-member classes per path, each bank sharded over the 16-way
    expert axis); top-2 routing, capacity dispatch, bf16 compute."""
    model = default_model_config(
        num_experts=64, top_k=2,
        unet_kernel_sizes=((3, 3),) * 32 + ((5, 5),) * 32,
        vit_patch_sizes=(4,) * 32 + (8,) * 32,
        expert_sharing="class_banks", dispatch="capacity", capacity_factor=2.0,
        compute_dtype="bfloat16",
        # explicit all-to-all token exchange over ICI (parallel/ep.py) —
        # plain GSPMD all-gathers the 64-expert banks (HLO-verified,
        # tests/test_ep_collectives.py)
        ep_all_to_all=True,
    )
    optim = OptimConfig(total_schedule_steps=total_steps)
    loss = EDMLossConfig(num_experts=64, unet_bal=0.05, vit_bal=0.1, z_bal=0.005)
    run = RunConfig(
        dataset="synthetic-native", data_img_res=256, vae="fake",
        total_steps=total_steps, save_dir="./checkpoints/moedit64",
        run_name="moedit_64expert_ep", mesh=mesh,
    )
    mask = _mask_cfg([3] * 32 + [5] * 32, [4] * 32 + [8] * 32)
    return model, optim, loss, mask, run


PRESETS = {
    "cifar10_pixel_config1": cifar10_pixel_config1,
    "heterogeneous_config2": heterogeneous_config2,
    "text_guided_64": text_guided_64,
    "latent_256_clip": latent_256_clip,
    "moedit_64expert_ep": moedit_64expert_ep,
}
