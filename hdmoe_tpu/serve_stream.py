"""Continuous (in-flight) batching for diffusion serving.

The request-level engines (serve.py) admit work at BATCH granularity: a
new request waits for the whole in-flight 35-NFE trajectory to finish
before its denoising starts. This module admits at STEP granularity — the
diffusion analog of LLM continuous batching (Orca/vLLM-style
iteration-level scheduling): ONE compiled per-sample-sigma solver tick
advances every batch slot by one ODE step AT ITS OWN step index, so a new
request occupies free slots on the very next tick while its neighbors are
mid-trajectory. Under streaming load this removes the batch-formation
wait from the latency tail without giving up batched MXU utilization.

TPU-first shape discipline — slot state is one static-shape device carry:

  ``x``      (B, H, W, C)  latents
  ``old_d``  (B, H, W, C)  DPM++(2M) multistep history (Heun: unused)
  ``idx``    (B,) int32    per-slot step index; ``idx == n`` = finished/idle

ticked by ONE ahead-of-time-compiled program (optionally ``ticks_per_call``
ticks chained in a ``lax.scan`` — a K>1 admission granularity amortizes the
per-call dispatch floor of a slow TPU tunnel). No recompiles under any
load pattern; the host mirrors ``idx`` (its update rule is deterministic)
so the scheduler never fetches device state except finished images.

Exactness: with per-sample dispatch (``dispatch="dense"``) a slot's
trajectory is bit-independent of its neighbors, so a streamed request
reproduces its lockstep ``SamplerEngine`` images exactly (pinned in
tests/test_serve_stream.py). Capacity dispatch ranks tokens across the
mixed-sigma batch — the same batch-composition caveat as request
coalescing (serve.py), with one new upside: mixed per-slot sigmas
DEcorrelate routing, exactly the sigma-correlation that caused the
capacity-drop FID cliff (PERF.md "Round 3: the capacity-drop fix").

Cost accounting vs lockstep: Heun's last-step corrector skip cannot be
elided per-slot under static shapes, so a streamed trajectory pays 2N
denoiser evals instead of 2N-1 (+2.9%% at N=18); DPM++(2M) pays N either
way. Stochastic churn is not supported (it would need per-slot key
streams); the default S_churn=0 path is unaffected.

Reference: no analog — the reference has no serving layer at all and its
sampler is a host-side Python loop over full batches
(Utils/EDM_sampler.py:72-109).
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hdmoe_tpu.adapters import make_text_encoder, make_vae
from hdmoe_tpu.models.configs import HDMOEMConfig
from hdmoe_tpu.models.hdmoem import precond_apply
from hdmoe_tpu.ops import mp as mp_ops
from hdmoe_tpu.sampler.edm import EDMSamplerConfig, karras_sigma_schedule, make_denoiser
from hdmoe_tpu.sampler.dpm import solver_nfe
from hdmoe_tpu.serve import ServeMetrics
from hdmoe_tpu.train.optim import project_mp_weights


def make_stream_tick(denoise_fn, cfg: EDMSamplerConfig, solver: str = "heun"):
    """Build ``tick(x, old_d, idx, text_emb) -> (x, old_d, idx)``: advance
    every slot by one solver step at its own index.

    Per-sample re-derivation of the lockstep solver bodies
    (sampler/edm.py:127-155, sampler/dpm.py:82-106): the scalar
    ``t_cur/t_next`` become per-slot gathers from the Karras schedule, and
    the lockstep control flow (``lax.cond`` corrector skip, scalar
    first-order gates) becomes per-slot ``where`` masks. Slots with
    ``idx >= num_steps`` are frozen (finished or idle).
    """
    if cfg.s_churn > 0:
        raise ValueError("streaming ticks are churn-free; set s_churn=0")
    t_steps = karras_sigma_schedule(cfg)  # (N+1,), terminal 0
    n = cfg.num_steps

    def tick(x, old_d, idx, text_emb):
        i = jnp.minimum(idx, n - 1)  # frozen slots eval at sigma_min (finite)
        active = (idx < n).reshape(-1, 1, 1, 1)
        s_cur = t_steps[i].reshape(-1, 1, 1, 1)  # > 0 always
        s_next_raw = t_steps[i + 1].reshape(-1, 1, 1, 1)  # 0 at the last step
        last = s_next_raw <= 0.0

        if solver == "heun":
            # Euler predictor + trapezoidal corrector, reference op order
            # (EDM_sampler.py:107 / sampler/edm.py:145-154). The corrector
            # always runs (static shapes) and is where'd away on the last
            # step; its sigma is made safe so the discarded eval is finite.
            denoised = denoise_fn(x, s_cur, text_emb)
            d_cur = (x - denoised) / s_cur
            x_euler = x + (s_next_raw - s_cur) * d_cur
            s_next_safe = jnp.where(last, 1.0, s_next_raw)
            denoised_p = denoise_fn(x_euler, s_next_safe, text_emb)
            d_prime = (x_euler - denoised_p) / s_next_safe
            x_heun = x + (s_next_raw - s_cur) * (0.5 * d_cur + 0.5 * d_prime)
            x_step = jnp.where(last, x_euler, x_heun)
            old_d_next = old_d
        elif solver == "dpmpp2m":
            # sampler/dpm.py:82-106 with per-slot i and history freeze.
            s_prev = t_steps[jnp.maximum(i - 1, 0)].reshape(-1, 1, 1, 1)
            denoised = denoise_fn(x, s_cur, text_emb)
            s_next_safe = jnp.maximum(s_next_raw, jnp.float32(1e-20))
            h = jnp.log(s_cur) - jnp.log(s_next_safe)
            h_last = jnp.log(s_prev) - jnp.log(s_cur)
            first_order = jnp.logical_or((i == 0).reshape(-1, 1, 1, 1), last)
            r_safe = jnp.where(first_order, 1.0, h_last / h)
            c = jnp.where(first_order, 0.0, 1.0 / (2.0 * r_safe))
            denoised_d = (1.0 + c) * denoised - c * old_d
            ratio = s_next_raw / s_cur
            x_step = ratio * x - jnp.expm1(-h) * denoised_d
            old_d_next = jnp.where(active, denoised, old_d)
        else:
            raise ValueError(f"unknown solver {solver!r} (heun | dpmpp2m)")

        x_next = jnp.where(active, x_step, x)
        idx_next = jnp.where(idx < n, idx + 1, idx)
        return x_next, old_d_next, idx_next

    return tick


class StreamingEngine:
    """Slot-state sampler: AOT per-sample-sigma ticks + host slot admission.

    Mirrors :class:`hdmoe_tpu.serve.SamplerEngine`'s weight handling (fold
    once, optional int8) and seed semantics (a request's noise rows are the
    leading rows of its seed's full-engine-batch draw, so a streamed
    request reproduces its coalesced/lockstep images under per-sample
    dispatch). Single-device; the scheduler half lives in
    :class:`StreamingFrontend`.
    """

    def __init__(
        self,
        cfg: HDMOEMConfig,
        params: Any,
        batch: int = 16,
        num_steps: int = 18,
        guidance: float = 1.0,
        transition_point: float = -1.2,
        softness: float = 1.6,
        vae_kind: str = "fake",
        text_kind: str = "fake",
        solver: str = "heun",
        ticks_per_call: int = 1,
        quantize: str = "none",
    ):
        assert ticks_per_call >= 1
        self.cfg = cfg
        self.batch = batch
        self.num_steps = num_steps
        self.solver = solver
        self.ticks_per_call = ticks_per_call
        self.nfe = solver_nfe(solver, num_steps) + (1 if solver == "heun" else 0)
        self.params = project_mp_weights(params)
        if quantize == "int8":
            from hdmoe_tpu.ops.quant import quantize_tree_int8

            self.params = quantize_tree_int8(self.params)
        elif quantize != "none":
            raise ValueError(f"unknown quantize {quantize!r} (none | int8)")
        self.quantize = quantize
        self.vae = make_vae(vae_kind, target_std=cfg.sigma_data)
        self.clip = (
            make_text_encoder(text_kind, width=cfg.text_emb_dim)
            if cfg.text_emb_dim
            else None
        )
        scfg = EDMSamplerConfig(num_steps=num_steps, guidance=guidance)
        self._sigma_max = float(karras_sigma_schedule(scfg)[0])
        # CFG reference embedding, as in SamplerEngine / generate.py:83-84
        uncond = (
            self.clip.encode_text([""] * batch)
            if (guidance != 1.0 and self.clip is not None)
            else None
        )

        shape = (batch, cfg.img_resolution, cfg.img_resolution, cfg.in_channels)
        text_shape = (batch, 77, cfg.text_emb_dim) if cfg.text_emb_dim else (1,)
        self._shape = shape
        self._has_text = cfg.text_emb_dim > 0

        def step_call(p, x, old_d, idx, text_emb):
            if quantize == "int8":
                from hdmoe_tpu.ops.quant import dequantize_tree

                p = dequantize_tree(p)

            def precond_fn(xx, sigma, te, m1, m2, zeta, transition_point, softness):
                return precond_apply(
                    p, cfg, xx, sigma, te, m1, m2, zeta,
                    transition_point=transition_point, softness=softness,
                )

            den = make_denoiser(precond_fn, cfg.num_experts, transition_point, softness,
                                guidance=guidance, uncond_text_emb=uncond)
            tick = make_stream_tick(den, scfg, solver)
            te = text_emb if self._has_text else None

            def body(carry, _):
                xx, od, ix = carry
                return tick(xx, od, ix, te), None

            (x, old_d, idx), _ = lax.scan(
                body, (x, old_d, idx), None, length=ticks_per_call
            )
            return x, old_d, idx

        params_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.params
        )
        x_spec = jax.ShapeDtypeStruct(shape, jnp.float32)
        idx_spec = jax.ShapeDtypeStruct((batch,), jnp.int32)
        text_spec = jax.ShapeDtypeStruct(text_shape, jnp.float32)
        with mp_ops.prenormalized_weights():
            self._step_aot = (
                jax.jit(step_call)
                .lower(params_spec, x_spec, x_spec, idx_spec, text_spec)
                .compile()
            )

        # one-dispatch slot admission: seed row j's noise + zero history +
        # idx=0 + this slot's text row, all via dynamic_update_slice (r, seed,
        # j are traced -> compiled once, reused for every admission)
        sigma_max = self._sigma_max

        def admit(x, old_d, idx, text_emb, r, seed, j, text_row):
            k_noise, _ = jax.random.split(jax.random.PRNGKey(seed))
            # full-engine-batch draw, row j: matches SamplerEngine /
            # BucketedEngine noise semantics (serve.py:_assemble_requests)
            row = jax.random.normal(k_noise, shape)[j] * sigma_max
            x = lax.dynamic_update_slice(x, row[None], (r, 0, 0, 0))
            old_d = lax.dynamic_update_slice(
                old_d, jnp.zeros_like(row)[None], (r, 0, 0, 0)
            )
            idx = lax.dynamic_update_slice(idx, jnp.zeros((1,), idx.dtype), (r,))
            if self._has_text:
                text_emb = lax.dynamic_update_slice(
                    text_emb, text_row[None], (r, 0, 0)
                )
            return x, old_d, idx, text_emb

        self._admit_jit = jax.jit(admit)
        self._decode_jit = jax.jit(self.vae.decode)
        self._text_row0 = jnp.zeros(text_shape[1:], jnp.float32)

        # device slot state (all slots idle) + the host idx mirror
        self._x = jnp.zeros(shape, jnp.float32)
        self._old_d = jnp.zeros(shape, jnp.float32)
        self._idx = jnp.full((batch,), num_steps, jnp.int32)
        self._text = jnp.zeros(text_shape, jnp.float32)
        self.idx_host = np.full((batch,), num_steps, np.int32)
        self.ticks_total = 0  # device calls * ticks_per_call (observability)
        self.calls_total = 0

    def encode_text(self, prompts: List[str]) -> Optional[jnp.ndarray]:
        """(k, 77, D) rows for a request, or None for unconditional configs."""
        if self.clip is None:
            return None
        return self.clip.encode_text(prompts)

    def admit_slot(self, r: int, seed: int, j: int,
                   text_row: Optional[jnp.ndarray]) -> None:
        """Start prompt ``j`` of a seed-``seed`` request in slot ``r``."""
        assert self.idx_host[r] >= self.num_steps, f"slot {r} still active"
        self._x, self._old_d, self._idx, self._text = self._admit_jit(
            self._x, self._old_d, self._idx, self._text,
            jnp.int32(r), jnp.uint32(seed & 0xFFFFFFFF), jnp.int32(j),
            text_row if text_row is not None else self._text_row0,
        )
        self.idx_host[r] = 0

    def tick(self) -> np.ndarray:
        """One device call (= ``ticks_per_call`` solver ticks). Returns the
        slot indices that finished DURING this call (host-computed — the
        idx update rule is deterministic, so no device fetch is needed)."""
        self._x, self._old_d, self._idx = self._step_aot(
            self.params, self._x, self._old_d, self._idx, self._text
        )
        before = self.idx_host.copy()
        self.idx_host = np.minimum(before + self.ticks_per_call, self.num_steps)
        self.idx_host[before >= self.num_steps] = before[before >= self.num_steps]
        self.calls_total += 1
        self.ticks_total += self.ticks_per_call
        return np.where(
            (before < self.num_steps) & (self.idx_host >= self.num_steps)
        )[0]

    def decode_rows(self, rows: List[int]) -> np.ndarray:
        """Decode + fetch the given finished slots: ONE compiled full-buffer
        VAE decode + one full-buffer D2H, rows picked host-side (a
        device-side gather would recompile per distinct row count — worse
        than the few extra MB of uint8 transfer on any host link)."""
        imgs = np.asarray(self._decode_jit(self._x))
        return imgs[np.asarray(rows, np.int32)]

    @property
    def active_slots(self) -> int:
        return int((self.idx_host < self.num_steps).sum())


class StreamingFrontend:
    """Thread-safe scheduler in front of a :class:`StreamingEngine`.

    One worker thread owns the engine. ``submit`` enqueues; the worker
    admits queued requests into free slots IN FIFO ORDER (head-of-line: a
    request needing more free slots than exist blocks later arrivals —
    fairness over packing) between device ticks, and delivers each
    request's images the tick its last slot finishes. Drop-in for
    :class:`hdmoe_tpu.serve.BatchingFrontend` where ``submit``/``metrics``
    are used (``make_server(..., frontend=...)`` serves it over HTTP).
    """

    def __init__(self, engine: StreamingEngine):
        self.engine = engine
        self.metrics = ServeMetrics()
        self._q: "queue.Queue" = queue.Queue()
        self._backlog: deque = deque()
        self._slot_req: Dict[int, dict] = {}  # slot -> request item
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, prompts: List[str], seed: int = 0) -> np.ndarray:
        """Blocking: enqueue and wait for this request's images."""
        assert len(prompts) <= self.engine.batch
        item = {
            "prompts": prompts, "seed": seed, "done": threading.Event(),
            "slots": [], "images": {},
        }
        t0 = time.perf_counter()
        self._q.put(item)
        item["done"].wait()
        self.metrics.record_request(
            len(prompts), time.perf_counter() - t0, error="error" in item
        )
        if "error" in item:
            raise item["error"]
        return item["result"]

    # -- worker internals ---------------------------------------------------

    def _free_slots(self) -> List[int]:
        eng = self.engine
        return [
            r for r in range(eng.batch)
            if eng.idx_host[r] >= eng.num_steps and r not in self._slot_req
        ]

    def _admit(self, item: dict) -> bool:
        """Admit every prompt of ``item`` into free slots; False if it does
        not fit (caller keeps it at the backlog head)."""
        free = self._free_slots()
        k = len(item["prompts"])
        if k > len(free):
            return False
        try:
            text = self.engine.encode_text(item["prompts"])
            for j, r in enumerate(free[:k]):
                self.engine.admit_slot(
                    r, item["seed"], j, text[j] if text is not None else None
                )
                self._slot_req[r] = item
                item["slots"].append((r, j))
        except Exception as e:  # noqa: BLE001 — handed back to the caller
            item["error"] = e
            for r, _ in item["slots"]:
                self._slot_req.pop(r, None)
            item["done"].set()
        return True

    def _drain_queue(self) -> None:
        while True:
            try:
                self._backlog.append(self._q.get_nowait())
            except queue.Empty:
                break
        while self._backlog:
            if not self._admit(self._backlog[0]):
                break  # FIFO head-of-line: wait for slots to free
            self._backlog.popleft()

    def _deliver_finished(self, finished: np.ndarray) -> None:
        done_items = []
        for r in finished:
            item = self._slot_req.pop(int(r), None)
            if item is None:
                continue
            if all(self.engine.idx_host[s] >= self.engine.num_steps
                   for s, _ in item["slots"]):
                done_items.append(item)
        if not done_items:
            return
        rows, owners = [], []
        for item in done_items:
            for r, j in sorted(item["slots"], key=lambda rj: rj[1]):
                rows.append(r)
                owners.append((item, j))
        try:
            imgs = self.engine.decode_rows(rows)
            for (item, j), img in zip(owners, imgs):
                item["images"][j] = img
            for item in done_items:
                item["result"] = np.stack(
                    [item["images"][j] for j in range(len(item["prompts"]))]
                )
        except Exception as e:  # noqa: BLE001
            for item in done_items:
                item["error"] = e
        finally:
            for item in done_items:
                self.metrics.record_run(None)
                item["done"].set()

    def _run(self):
        while True:
            if self.engine.active_slots == 0 and not self._backlog:
                self._backlog.append(self._q.get())  # idle: block, zero ticks
            self._drain_queue()
            if self.engine.active_slots == 0:
                continue  # backlog head bigger than the whole engine? (can't
                # happen: submit asserts k <= batch and all slots are free)
            finished = self.engine.tick()
            if len(finished):
                self._deliver_finished(finished)
