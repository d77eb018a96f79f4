"""The reference config surface (Utils/configs.py:3-70), kept verbatim as
dicts plus typed builders.

Every key from the reference's five config dicts is preserved so a reference
user can bring their configs across unchanged; ``build_configs`` converts
them into the framework's typed configs.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from hdmoe_tpu.models.configs import HDMOEMConfig, config_from_dict
from hdmoe_tpu.train.loss import EDMLossConfig
from hdmoe_tpu.train.optim import OptimConfig
from hdmoe_tpu.train.train_loop import RunConfig

model_configs: Dict[str, Any] = {
    "save_dir": "./checkpoints/flower_run",
    "save_dir_stats": "./logs",
    "device": "tpu",
    "img_channels": 4,
    "internal_channels": 32,
    "data_img_res": 256,
    "img_resolution": 32,
    "time_emb_dim": 64,
    "text_emb_dim": 768,
    "num_experts": 4,
    "top_k": 1,
    "fourier_bandwidth": 1.0,
    "VIT_num_blocks": 4,
    "VIT_patch_sizes": [4, 8, 8, 16],
    "VIT_num_groups": 4,
    "VIT_num_heads": 8,
    "VIT_emb_size": 32,
    "Unet_num_blocks": 2,
    "Unet_channel_mult": [1, 2],
    "Unet_kernel_sizes": [(3, 3), (3, 3), (5, 5), (5, 5)],
    "Unet_model_channels": 32,
    "Unet_channel_mult_emb": 2,
    "Unet_label_balance": 0.5,
    "Unet_concat_balance": 0.5,
    "sigma_data": 0.5,
    "log_var_channels": 32,
    "batch_size": 32,
    "total_steps": 5000,
    "sigma_min": 0.002,
    "sigma_max": 80,
    "fixed_prompt": "a photo of a flower",
}

loss_configs: Dict[str, Any] = {
    "unet_bal": 0.05,
    "vit_bal": 0.1,
    "z_bal": 0.005,
    "prior_bal": 0.0,
}

optim_configs: Dict[str, Any] = {
    "eta_min": 1e-5,
    "lr_vit": 2e-3,
    "lr_unet": 5e-4,
    "lr_attn": 1e-3,
    "lr_router": 5e-4,
    "total_schedule_steps": 5000,
}

mask_configs: Dict[str, Any] = {
    "unet_attr": [3, 3, 5, 5],
    "vit_attr": [4, 8, 8, 16],
    "p_mean": -1.2,
    "p_std": 1.6,
    "BW": 0.3,
    "max_BW": 0.8,
    "min_active": 1,
    "step_size": 0.1,
    "strat_band": "step",
    "unet_noise_range": (0.0, 0.6),
    "vit_noise_range": (0.4, 1.0),
}

zeta_configs: Dict[str, Any] = {
    "min_zeta": 0.01,
    "max_zeta": 2,
    "warmup_ratio": 0.05,
    "strategy": "cos",
    "alpha": 4.0,
    "total_schedule_steps": 900,
}


def build_configs(
    model_d: Dict[str, Any] = model_configs,
    optim_d: Dict[str, Any] = optim_configs,
    loss_d: Dict[str, Any] = loss_configs,
) -> Tuple[HDMOEMConfig, OptimConfig, EDMLossConfig, RunConfig]:
    """Reference-style dicts -> typed framework configs."""
    mcfg = config_from_dict(model_d)
    ocfg = OptimConfig(
        lr_vit=optim_d["lr_vit"], lr_unet=optim_d["lr_unet"], lr_attn=optim_d["lr_attn"],
        lr_router=optim_d["lr_router"], lr_other=optim_d.get("lr_other", optim_d["lr_unet"]),
        eta_min=optim_d["eta_min"], total_schedule_steps=optim_d["total_schedule_steps"],
    )
    lcfg = EDMLossConfig(
        num_experts=model_d["num_experts"], sigma_data=model_d["sigma_data"],
        unet_bal=loss_d["unet_bal"], vit_bal=loss_d["vit_bal"], z_bal=loss_d["z_bal"],
        prior_bal=loss_d["prior_bal"],
    )
    rcfg = RunConfig(
        save_dir=model_d.get("save_dir", "./checkpoints/run"),
        batch_size=model_d["batch_size"], total_steps=model_d["total_steps"],
        data_img_res=model_d["data_img_res"], fixed_prompt=model_d["fixed_prompt"],
    )
    return mcfg, ocfg, lcfg, rcfg
