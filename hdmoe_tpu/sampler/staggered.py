"""Staggered (continuous-batching) EDM sampler — capacity dispatch without
the lockstep routing collapse.

Why this exists: in lockstep sampling (sampler/edm.py) every image in the
batch shares ONE sigma per Heun step. The routers are noise-conditioned
(adaLN time modulation, models/components.py:router_apply), so at each step
they route the WHOLE batch toward the same expert(s); fixed-capacity
dispatch provisions ``cf*B/E`` slots per expert, drops or rerotes the rest,
and on sharply-specialized checkpoints quality collapses — FID 0.286 dense
vs 3.17 at cf1-priority on the b128+LRx2 checkpoint of record
(artifacts/dial_second_ckpt_r4/RESULTS.json). The reference never drops a
routed sample (model_config1.py:26-38 runs ragged per-expert sub-batches).
Training never meets this regime either: training batches draw per-sample
sigmas (train/sigma.py), so the capacity paths behave there.

The staggered sampler restores the training-time routing distribution at
serving time. ``B`` slots advance through the same Karras schedule at evenly
staggered step offsets, so every program call sees a mixed-sigma batch:
per-step expert load concentrates around B/E instead of B, and capacity
dispatch keeps (almost) every routed token — the reference's no-drop
guarantee at capacity-dispatch speed. Per-slot sigma is native to the model
(``precond_apply`` broadcasts (B,1,1,1) sigma; that is exactly how training
batches run).

Mechanics: slot ``i`` has a fixed phase offset ``o_i = i*n // B``. At global
iteration ``it`` it sits at step ``s_i = (it + o_i) mod n``. A slot at
``s==0`` is re-seeded with fresh noise (PRNG folded on the global iteration,
so every image gets an independent draw); a slot finishing step ``n-1``
deposits its image into the output buffer. Over any window of ``n``
iterations each slot completes exactly one image, so one jitted
``round = lax.scan over n iterations`` yields ``B`` images. The VERY FIRST
round is warm-up (slots with ``o_i > 0`` began mid-schedule from a noise
init) and must be discarded; every later round is valid.

Cost accounting: every iteration runs the Heun corrector for all slots (the
``s == n-1`` slots' second eval is masked out), so per-image NFE is ``2n``
vs lockstep's ``2n-1`` — +2.9%% at n=18. Heun math keeps the reference op
order (EDM_sampler.py:90-107); under dense dispatch a slot's trajectory is
bit-comparable with the lockstep sampler fed the same noise
(tests/test_staggered.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from hdmoe_tpu.sampler.edm import EDMSamplerConfig, karras_sigma_schedule


def staggered_offsets(batch: int, num_steps: int) -> jnp.ndarray:
    """Evenly spread slot phase offsets over the schedule: ``i*n // B``."""
    return (jnp.arange(batch) * num_steps) // batch


def make_staggered_round(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray],
    cfg: EDMSamplerConfig,
    batch: int,
    solver: str = "heun",
):
    """Build ``round_fn(state, base_it, text_emb, key) -> (state, images)``.

    ``state`` is a dict pytree: ``x`` (slot latents), ``outbuf``, and — for
    the dpm solver — ``old_d`` (the per-slot multistep history, which must
    survive round boundaries: slots are mid-trajectory when a round ends).
    Initialize with :func:`staggered_init_state`. One call advances every
    slot ``num_steps`` iterations (one full image per slot) as a single
    ``lax.scan`` program. ``base_it`` is the global
    iteration counter (traced — one compile serves every round) and threads
    both the phase arithmetic and the per-image PRNG folding. The returned
    ``images`` buffer holds each slot's most recently finished image; the
    caller must discard the first round (warm-up).

    ``solver="heun"`` costs 2 evals/iteration (2n NFE/image, vs lockstep's
    2n-1 — the corrector runs every iteration and is masked out for slots on
    their final step). ``solver="dpmpp2m"`` (sampler/dpm.py, DPM-Solver++
    (2M)) is 1 eval/iteration — n NFE/image, exactly lockstep — with the
    multistep history ``old_d`` carried per slot; every update term is
    elementwise in sigma, so the per-slot form is the lockstep formula with
    (B,1,1,1) broadcasts. The round-5 serving sweet spot: dpm-20 staggered
    at ~55%% of the Heun-18 staggered cost with the dpm20 quality point.
    """
    assert cfg.s_churn == 0.0, "staggered sampler: stochastic churn unsupported"
    assert solver in ("heun", "dpmpp2m"), solver
    n = cfg.num_steps
    t_steps = karras_sigma_schedule(cfg)
    offsets = staggered_offsets(batch, n)

    def heun_round(state, base_it, text_emb, key):
        x, outbuf = state["x"], state["outbuf"]

        def body(carry, it):
            x, outbuf = carry
            s = (it + offsets) % n  # (B,) per-slot step index
            t_cur = t_steps[s].reshape(-1, 1, 1, 1)
            t_next = t_steps[s + 1].reshape(-1, 1, 1, 1)

            # Re-seed slots entering step 0 with an independent noise draw.
            fresh = (
                jax.random.normal(jax.random.fold_in(key, it), x.shape, jnp.float32)
                * t_steps[0]
            )
            x = jnp.where((s == 0)[:, None, None, None], fresh, x)

            # Heun step, reference op order (EDM_sampler.py:90-107), with
            # per-slot sigma. The final step (t_next == 0) is Euler-only;
            # its corrector eval runs at a masked dummy sigma of 1.0.
            denoised = denoise_fn(x, t_cur, text_emb)
            d_cur = (x - denoised) / t_cur
            x_euler = x + (t_next - t_cur) * d_cur
            t_next_safe = jnp.where(t_next > 0, t_next, 1.0)
            denoised_p = denoise_fn(x_euler, t_next_safe, text_emb)
            d_prime = (x_euler - denoised_p) / t_next_safe
            x_heun = x + (t_next - t_cur) * (0.5 * d_cur + 0.5 * d_prime)

            last = (s == n - 1)[:, None, None, None]
            x_new = jnp.where(last, x_euler, x_heun)
            outbuf = jnp.where(last, x_new, outbuf)
            return (x_new, outbuf), None

        (x, outbuf), _ = lax.scan(
            body, (x, outbuf), base_it + jnp.arange(n), unroll=max(1, cfg.scan_unroll)
        )
        return {"x": x, "outbuf": outbuf}, outbuf

    def dpm_round(state, base_it, text_emb, key):
        # The per-slot multistep history old_d rides the STATE, not just the
        # scan carry — slots are mid-trajectory at round boundaries. A reset
        # slot's stale old_d is ignored (first_order gates it) and
        # overwritten by its own first denoised below. Math mirrors
        # dpm.py:dpmpp_2m_sample.
        x, old_d, outbuf = state["x"], state["old_d"], state["outbuf"]

        def body(carry, it):
            x, old_d, outbuf = carry
            s = (it + offsets) % n
            t_cur = t_steps[s].reshape(-1, 1, 1, 1)
            t_next = t_steps[s + 1].reshape(-1, 1, 1, 1)
            t_prev = t_steps[jnp.maximum(s - 1, 0)].reshape(-1, 1, 1, 1)

            is0 = (s == 0)[:, None, None, None]
            fresh = (
                jax.random.normal(jax.random.fold_in(key, it), x.shape, jnp.float32)
                * t_steps[0]
            )
            x = jnp.where(is0, fresh, x)

            denoised = denoise_fn(x, t_cur, text_emb)
            s_next_safe = jnp.maximum(t_next, jnp.float32(1e-20))
            h = jnp.log(t_cur) - jnp.log(s_next_safe)
            h_last = jnp.log(t_prev) - jnp.log(t_cur)
            first_order = jnp.logical_or(is0, t_next <= 0.0)
            r_safe = jnp.where(first_order, 1.0, h_last / h)
            c = jnp.where(first_order, 0.0, 1.0 / (2.0 * r_safe))
            denoised_d = (1.0 + c) * denoised - c * old_d
            x_next = (t_next / t_cur) * x - jnp.expm1(-h) * denoised_d

            last = (s == n - 1)[:, None, None, None]
            outbuf = jnp.where(last, x_next, outbuf)
            return (x_next, denoised, outbuf), None

        (x, old_d, outbuf), _ = lax.scan(
            body, (x, old_d, outbuf), base_it + jnp.arange(n),
            unroll=max(1, cfg.scan_unroll),
        )
        return {"x": x, "old_d": old_d, "outbuf": outbuf}, outbuf

    return dpm_round if solver == "dpmpp2m" else heun_round


def staggered_init_state(batch: int, shape, solver: str = "heun"):
    """Zero-initialized staggered state for ``make_staggered_round``.

    ``shape`` is the per-slot latent shape (H, W, C)."""
    import jax.numpy as jnp

    full = (batch,) + tuple(shape)
    state = {"x": jnp.zeros(full, jnp.float32),
             "outbuf": jnp.zeros(full, jnp.float32)}
    if solver == "dpmpp2m":
        state["old_d"] = jnp.zeros(full, jnp.float32)
    return state


class StaggeredEngine:
    """Streaming sampler: each ``sample_round()`` yields ``batch`` latents.

    Mirrors ``serve.SamplerEngine``'s model/adapters plumbing (folded MP
    weights, fake/real VAE + text encoder, optional CFG) but runs the
    staggered schedule. The first round after construction is warm-up and is
    consumed internally; steady-state throughput is ``batch`` images per
    round at ``2*num_steps`` NFE each.
    """

    def __init__(
        self,
        cfg,
        params,
        batch: int = 32,
        num_steps: int = 18,
        guidance: float = 1.0,
        transition_point: float = -1.2,
        softness: float = 1.6,
        vae_kind: str = "fake",
        text_kind: str = "fake",
        solver: str = "heun",
    ):
        from functools import partial

        from hdmoe_tpu.adapters import make_text_encoder, make_vae
        from hdmoe_tpu.models.hdmoem import precond_apply
        from hdmoe_tpu.sampler.edm import make_denoiser
        from hdmoe_tpu.train.optim import project_mp_weights

        self.cfg = cfg
        self.batch = batch
        self.num_steps = num_steps
        self.solver = solver
        self.nfe_per_image = 2 * num_steps if solver == "heun" else num_steps
        self.params = project_mp_weights(params)
        self.vae = make_vae(vae_kind, target_std=cfg.sigma_data)
        self.clip = (
            make_text_encoder(text_kind, width=cfg.text_emb_dim)
            if cfg.text_emb_dim
            else None
        )
        uncond = (
            self.clip.encode_text([""] * batch)
            if (guidance != 1.0 and self.clip is not None)
            else None
        )
        scfg = EDMSamplerConfig(num_steps=num_steps, guidance=guidance)

        def round_call(p, state, base_it, text_emb, key):
            precond_fn = partial(precond_apply, p, cfg)
            den = make_denoiser(
                precond_fn, cfg.num_experts, transition_point, softness,
                guidance=guidance, uncond_text_emb=uncond,
            )
            rf = make_staggered_round(den, scfg, batch, solver=solver)
            return rf(state, base_it, text_emb, key)

        # No donation: sample_round hands the outbuf to the caller, and a
        # donated input would invalidate that reference on the next round.
        self._round = jax.jit(round_call)
        self._state = staggered_init_state(
            batch, (cfg.img_resolution, cfg.img_resolution, cfg.in_channels),
            solver)
        self._it = 0
        self._key = jax.random.PRNGKey(0)
        self._text = None
        self._warm = False

    def set_prompts(self, prompts, seed: int = 0):
        """Pin the text conditioning for subsequent rounds (one prompt per
        slot; fewer prompts are cycled). Resets warm-up."""
        self._key = jax.random.PRNGKey(seed)
        if self.clip is not None:
            reps = (self.batch + len(prompts) - 1) // len(prompts)
            self._text = self.clip.encode_text((prompts * reps)[: self.batch])
        self._warm = False

    def sample_round(self) -> jnp.ndarray:
        """Advance one round; return ``batch`` fresh fp32 latents."""
        if not self._warm:
            self._state, _ = self._round(
                self.params, self._state, jnp.int32(self._it),
                self._text, self._key,
            )
            self._it += self.num_steps
            self._warm = True
        self._state, images = self._round(
            self.params, self._state, jnp.int32(self._it),
            self._text, self._key,
        )
        self._it += self.num_steps
        return images

    def sample_images(self) -> jnp.ndarray:
        """One round, VAE-decoded to images."""
        return self.vae.decode(self.sample_round())
