"""Hermetic end-to-end training smoke run (CPU-friendly, no network).

Usage: ``JAX_PLATFORM_NAME=cpu python -m hdmoe_tpu.train.smoke [steps]``

Runs the full training_hdmoe pipeline (synthetic data -> FakeVAE -> FakeCLIP
-> HDMOEM -> EDM loss -> AdamW -> JSONL logs -> orbax checkpoint) on a tiny
model for a handful of steps.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from hdmoe_tpu.models.configs import HDMOEMConfig
from hdmoe_tpu.train.configs import mask_configs, zeta_configs
from hdmoe_tpu.train.loss import EDMLossConfig
from hdmoe_tpu.train.optim import OptimConfig
from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe


def main(steps: int = 5):
    model_cfg = HDMOEMConfig(
        in_channels=4,
        img_resolution=8,
        internal_channels=8,
        time_emb_dim=16,
        text_emb_dim=768,
        num_experts=2,
        vit_patch_sizes=(2, 4),
        vit_emb_size=16,
        vit_num_blocks=1,
        vit_num_groups=4,
        vit_num_heads=4,
        unet_num_blocks=1,
        unet_model_channels=8,
        unet_kernel_sizes=((3, 3), (5, 5)),
        log_var_channels=8,
    )
    optim_cfg = OptimConfig(total_schedule_steps=steps)
    loss_cfg = EDMLossConfig(num_experts=2, unet_bal=0.05, vit_bal=0.1, z_bal=0.005)
    mask_cfg = dict(mask_configs, unet_attr=[3, 5], vit_attr=[2, 4])
    run_cfg = RunConfig(
        save_dir="/tmp/hdmoe_smoke/ckpt",
        log_dir="/tmp/hdmoe_smoke/logs",
        run_name="smoke",
        batch_size=4,
        total_steps=steps,
        save_interval=0,
        log_interval=2,
        data_img_res=64,
        dataset="synthetic",
        vae="fake",
        text_encoder="fake",
        print_interval=1,
    )
    metrics = training_hdmoe(model_cfg, optim_cfg, loss_cfg, mask_cfg, zeta_configs, run_cfg)
    print("final metrics:", {k: round(v, 4) for k, v in metrics.items() if k in ("loss", "denoising")})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
