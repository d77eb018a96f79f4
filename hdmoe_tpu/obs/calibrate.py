"""Capacity-profile calibration: measure per-expert routing load shares.

The round-5 serving dial (`HDMOEMConfig.capacity_profile_unet/vit`)
provisions each expert's static capacity for its MEASURED share of the
mixed-sigma routing load instead of the uniform ``cf*B/E``
(models/configs.py:capacity_for). Shares are a checkpoint property —
artifacts/router_telemetry_r5.json measured [0.32, 0.00, 0.16, 0.52] on
the b128+LRx2 recipe — so deployments calibrate once per checkpoint with
this module (``python -m hdmoe_tpu calibrate``) and pin the resulting
fractions in their serving config.

Method (the staggered sampler's steady state, sampler/staggered.py): run a
dense-dispatch trajectory over the sampling schedule, re-evaluate the
routers on a mixed-sigma batch assembled from that trajectory (slot i at
step ``i*n // B``), and report each expert's top-1 share with a slack
multiplier. No reference analog (the reference's ragged dispatch never
needed provisioning — model_config1.py:26-38).
"""

from __future__ import annotations

from typing import Optional, Tuple


def measure_capacity_profile(
    params,
    cfg,
    batch: int = 128,
    num_steps: int = 18,
    slack: float = 1.2,
    min_frac: float = 0.02,
    prompt_emb=None,
    seed: int = 11,
) -> Tuple[Tuple[float, ...], Tuple[float, ...], dict]:
    """Measure mixed-sigma per-expert load shares for ``params``.

    Returns ``(unet_profile, vit_profile, report)`` where the profiles are
    per-expert batch fractions (share * slack, floored at ``min_frac`` so a
    cold expert keeps a nonzero sub-batch) ready for
    ``capacity_profile_unet/vit``, and ``report`` carries the raw loads.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hdmoe_tpu.models.hdmoem import precond_apply
    from hdmoe_tpu.sampler.edm import EDMSamplerConfig, karras_sigma_schedule

    e = cfg.num_experts
    scfg = EDMSamplerConfig(num_steps=num_steps)
    t_steps = np.asarray(karras_sigma_schedule(scfg))
    if prompt_emb is None and cfg.text_emb_dim:
        prompt_emb = jnp.zeros((batch, 77, cfg.text_emb_dim), jnp.float32)

    @jax.jit
    def eval_step(x, sigma):
        ones = jnp.ones((x.shape[0], e), jnp.float32)
        out = precond_apply(params, cfg, x, sigma, prompt_emb, ones, ones, 0.0,
                            transition_point=-1.2, softness=1.6)
        return out["denoised"], out["Unet_router_loss"], out["vit_router_loss"]

    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(
        key, (batch, cfg.img_resolution, cfg.img_resolution, cfg.in_channels)
    ) * float(t_steps[0])
    xs_by_step = []
    for i in range(num_steps):
        t_cur, t_next = float(t_steps[i]), float(t_steps[i + 1])
        xs_by_step.append(np.asarray(x))
        denoised, _, _ = eval_step(x, jnp.full((1, 1, 1, 1), t_cur))
        d = (x - denoised) / t_cur
        x_e = x + (t_next - t_cur) * d
        if i < num_steps - 1:
            den_p, _, _ = eval_step(x_e, jnp.full((1, 1, 1, 1), t_next))
            x = x + (t_next - t_cur) * (0.5 * d + 0.5 * (x_e - den_p) / t_next)
        else:
            x = x_e

    sidx = (np.arange(batch) * num_steps) // batch  # staggered steady state
    x_mix = jnp.asarray(np.stack([xs_by_step[s][j] for j, s in enumerate(sidx)]))
    sig_mix = jnp.asarray(t_steps[sidx], jnp.float32).reshape(-1, 1, 1, 1)
    _, up, vp = eval_step(x_mix, sig_mix)

    def profile(p):
        loads = np.bincount(np.argmax(np.asarray(p, np.float32), axis=1),
                            minlength=e) / batch
        return tuple(round(max(min_frac, min(1.0, f * slack)), 3) for f in loads), loads

    unet_prof, unet_loads = profile(up)
    vit_prof, vit_loads = profile(vp)
    report = {
        "batch": batch, "num_steps": num_steps, "slack": slack,
        "unet_loads": unet_loads.tolist(), "vit_loads": vit_loads.tolist(),
        "unet_profile": list(unet_prof), "vit_profile": list(vit_prof),
        # cf=1 provisions a total of 1.0*B per path (E experts x B/E)
        "flops_multiplier_vs_cf1": round(
            (sum(unet_prof) + sum(vit_prof)) / 2.0, 3),
    }
    return unet_prof, vit_prof, report
