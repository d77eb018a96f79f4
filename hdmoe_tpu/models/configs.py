"""Model configuration for the HDMOEM assembly.

Keeps the reference config surface (Utils/configs.py:3-35) as a frozen
dataclass plus helpers to build one from the reference-style plain dict.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple


@dataclass(frozen=True)
class HDMOEMConfig:
    # Reference HDMOEM constructor surface (model_config2.py:74-95)
    in_channels: int = 4
    img_resolution: int = 32
    internal_channels: int = 32
    time_emb_dim: int = 64
    text_emb_dim: int = 768
    num_experts: int = 4
    top_k: int = 1
    fourier_bandwidth: float = 1.0
    vit_num_blocks: int = 4
    vit_patch_sizes: Tuple[int, ...] = (4, 8, 8, 16)
    vit_num_groups: int = 4
    vit_num_heads: int = 8
    vit_emb_size: int = 32
    unet_num_blocks: int = 2
    unet_channel_mult: Tuple[int, ...] = (1, 2)
    unet_kernel_sizes: Tuple[Tuple[int, int], ...] = ((3, 3), (3, 3), (5, 5), (5, 5))
    unet_model_channels: int = 32
    unet_channel_mult_emb: Optional[int] = 2
    unet_label_balance: float = 0.5
    unet_concat_balance: float = 0.5
    # Preconditioning surface (model_config2.py:331-354)
    sigma_data: float = 0.5
    log_var_channels: int = 128
    # EDM skip-connection form (models/hdmoem.py:precond_apply):
    #   "reference": D = c_skip*(c_in*x) + c_out*F — the reference's
    #       non-canonical form (model_config2.py:440-449), kept as default
    #       for bit parity; its sampler ODE diverges below the trained
    #       sigma range (see precond_apply).
    #   "canonical": D = c_skip*x + c_out*F (EDM paper) — stable as
    #       sigma -> 0.
    skip_mode: str = "reference"
    # TPU-native knobs (no reference analog)
    variant: str = "config2"  # "config1": learned Scaling_router + dynamic query/context swap
    # "dense": all experts on all samples, combined by sparse gate (exact)
    # "capacity": fixed-capacity gather/scatter dispatch (XLA gather)
    # "einsum": capacity semantics, token movement as one-hot MATMULS on the
    #           MXU with the gate-weight multiply folded into the combine
    #           (GShard-style; moe.py:moe_dispatch_capacity_einsum)
    # "pallas": capacity semantics, token movement via the Pallas
    #           dispatch/combine kernels (ops/pallas/moe_kernels.py)
    # "grouped": shape-class bank dispatch (heterogeneous pools only)
    dispatch: str = "dense"
    capacity_factor: float = 2.0  # capacity = ceil(cf * B * top_k / num_experts), clamped to B
    # Capacity-overflow policy for the capacity-limited dispatch modes
    # (models/moe.py:reroute_overflow):
    #   "fcfs"     first-come-first-served by batch position; overflow drops
    #              to the skip path (classic MoE serving semantics).
    #   "priority" rank routed tokens by router confidence and reroute
    #              overflow to the token's next-choice expert — closes most
    #              of the capacity-drop FID gap under the sigma-correlated
    #              routing of EDM sampling (PERF.md serving dial).
    capacity_policy: str = "fcfs"
    # Round-5 load-profiled per-expert capacities (serving dial). Fractions
    # of the batch, one per expert, slack baked in: expert i's capacity is
    # ceil(frac_i * B) instead of the uniform cf*B*k/E. Rationale: under
    # mixed-sigma batches (training, or the staggered sampler) the routers'
    # per-expert load shares are stable but UNEQUAL (measured
    # [0.32, 0.00, 0.16, 0.52] on the checkpoint of record,
    # artifacts/router_telemetry_r5.json) — uniform capacity must choose
    # between drops (cf=1) and ~2x FLOPs (cf=2); profiled capacities cover
    # the measured load at ~1.25x. Calibrate per checkpoint with
    # scripts/router_telemetry_r5.py. Only the per-expert ("heterogeneous")
    # sharing path supports this (experts are separate compile units there);
    # stacked/class_banks banks need uniform shapes.
    capacity_profile_unet: Optional[Tuple[float, ...]] = None
    capacity_profile_vit: Optional[Tuple[float, ...]] = None
    use_flash: bool = False  # Pallas flash-attention core on TPU
    # Attention core selection: "auto" (flash iff use_flash), "dense",
    # "flash", or "ring" (sequence-parallel over a mesh axis; needs an
    # active ops.attention.ring_attention_context — 256x256+ configs).
    attention_impl: str = "auto"
    compute_dtype: str = "float32"  # "float32" | "bfloat16" activation dtype
    # Conv lowering (ops/mp.py:conv_layout):
    #   "xla"      lax.conv on NHWC
    #   "pallas"   VMEM-im2col Pallas kernel for stride-1 odd convs
    #              (ops/pallas/conv.py), XLA elsewhere
    #   "im2col_t" explicit transposed im2col matmul (measured slower than
    #              the XLA conv — HBM patch materialization; kept as the
    #              documented control, artifacts/profile_r2/conv_layout2.json)
    conv_impl: str = "xla"
    # Rematerialize expert forwards in the backward pass (jax.checkpoint):
    # trades recompute for activation memory on the 256x256+ configs.
    remat_experts: bool = False
    # Pipeline the ViT experts' block stack through the GPipe schedule
    # (parallel/pipeline.py) when a pipeline_context(mesh, axis) is active:
    # requires vit_num_blocks == the pipeline mesh axis size. The deep-ViT
    # regime knob (256x256+ stretch configs).
    pipeline_vit_blocks: bool = False  # microbatch count comes from the context
    # Explicit all-to-all expert parallelism (parallel/ep.py): when True and
    # an ep_context(mesh) is active, stacked-bank dispatch shards tokens
    # over (data x expert) and exchanges them with lax.all_to_all instead of
    # relying on GSPMD (which measured as all-gathering the weight banks).
    ep_all_to_all: bool = False
    # "heterogeneous": per-expert kernel/patch sizes, separate compile units
    #   (the reference architecture).
    # "stacked": identical experts stacked on a leading axis -> true expert
    #   parallelism over the mesh "expert" axis (homogeneous pools only).
    # "class_banks": HETEROGENEOUS expert parallelism — experts grouped by
    #   shape class (identical kernel/patch size within a class), one
    #   stacked bank per class, each bank sharded over the expert mesh axis
    #   (models/hdmoem.py:_class_bank_dispatch). Keeps the reference's
    #   defining per-expert sizes (model_config1.py:152-177) at EP scale;
    #   under ep_all_to_all each class's member count must divide the
    #   expert axis size.
    expert_sharing: str = "heterogeneous"

    def __post_init__(self):
        assert self.capacity_policy in ("fcfs", "priority"), (
            f"capacity_policy must be 'fcfs' or 'priority', got "
            f"{self.capacity_policy!r} (a typo would silently fall back to "
            f"FCFS drops and reopen the capacity FID cliff)"
        )
        if self.expert_sharing == "stacked":
            assert len(set(self.unet_kernel_sizes)) == 1, (
                "stacked expert banks need identical U-Net kernel sizes "
                "(use expert_sharing='class_banks' for heterogeneous pools)"
            )
            assert len(set(self.vit_patch_sizes)) == 1, (
                "stacked expert banks need identical ViT patch sizes "
                "(use expert_sharing='class_banks' for heterogeneous pools)"
            )

    def capacity(self, batch_size: int) -> int:
        import math

        cap = math.ceil(self.capacity_factor * batch_size * self.top_k / self.num_experts)
        return max(1, min(batch_size, cap))

    def capacity_for(self, batch_size: int, path: str):
        """Per-path capacity: the load profile's per-expert ceil(frac*B)
        tuple when set (see capacity_profile_unet/vit), else the uniform
        scalar ``capacity(B)``."""
        import math

        profile = (self.capacity_profile_unet if path == "unet"
                   else self.capacity_profile_vit)
        if profile is None:
            return self.capacity(batch_size)
        assert len(profile) == self.num_experts, (path, profile)
        assert self.expert_sharing == "heterogeneous", (
            "capacity_profile needs per-expert compile units "
            "(expert_sharing='heterogeneous'); banks are uniform-shape")
        return tuple(max(1, min(batch_size, math.ceil(f * batch_size)))
                     for f in profile)

    @property
    def attn_impl(self) -> str:
        """Resolved attention core ("auto" defers to the use_flash flag)."""
        if self.attention_impl != "auto":
            return self.attention_impl
        return "flash" if self.use_flash else "dense"


def default_model_config(**overrides) -> HDMOEMConfig:
    """The reference config of record (Utils/configs.py:3-35)."""
    return replace(HDMOEMConfig(), **overrides)


def config_from_dict(d: dict) -> HDMOEMConfig:
    """Build from a reference-style ``model_configs`` dict (Utils/configs.py keys)."""
    return HDMOEMConfig(
        in_channels=d["img_channels"],
        img_resolution=d["img_resolution"],
        internal_channels=d["internal_channels"],
        time_emb_dim=d["time_emb_dim"],
        text_emb_dim=d["text_emb_dim"],
        num_experts=d["num_experts"],
        top_k=d["top_k"],
        fourier_bandwidth=d["fourier_bandwidth"],
        vit_num_blocks=d["VIT_num_blocks"],
        vit_patch_sizes=tuple(d["VIT_patch_sizes"]),
        vit_num_groups=d["VIT_num_groups"],
        vit_num_heads=d["VIT_num_heads"],
        vit_emb_size=d["VIT_emb_size"],
        unet_num_blocks=d["Unet_num_blocks"],
        unet_channel_mult=tuple(d["Unet_channel_mult"]),
        unet_kernel_sizes=tuple(tuple(k) for k in d["Unet_kernel_sizes"]),
        unet_model_channels=d["Unet_model_channels"],
        unet_channel_mult_emb=d.get("Unet_channel_mult_emb"),
        unet_label_balance=d.get("Unet_label_balance", 0.5),
        unet_concat_balance=d.get("Unet_concat_balance", 0.5),
        sigma_data=d.get("sigma_data", 0.5),
        log_var_channels=d.get("log_var_channels", 128),
        variant=d.get("variant", "config2"),
        dispatch=d.get("dispatch", "dense"),
        use_flash=d.get("use_flash", False),
    )
