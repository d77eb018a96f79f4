"""Minimal batched sampling server (production-serving entry point).

The reference has no serving layer (SURVEY.md §1: "no serving/inference
server"). This module provides one TPU-first:

- the full 35-NFE sampler is ONE ahead-of-time-compiled XLA executable with
  folded (pre-normalized) MP weights — no Python in the denoising loop;
- each request (up to ``batch`` prompts) is padded to the compiled batch
  size (static shapes);
- a single worker thread owns the engine (``BatchingFrontend``): concurrent
  HTTP requests enqueue and are COALESCED into one compiled run when their
  prompt counts fit in the engine batch — the compiled executable and the
  adapters are never entered concurrently;
- zero external dependencies: stdlib ``http.server`` + JSON.

API:
  POST /sample {"prompts": [...], "seed"?: int, "format"?: "png"|"raw"}
      -> {"images": [base64 PNG, ...], "shape": [...], "latency_ms": f}
         ("raw" returns nested uint8 lists instead — large)
  GET  /healthz -> {"ok": true, "device": "...", "batch": N, "buckets"?: [...]}
  GET  /metrics -> Prometheus text format (requests/images/errors/runs
      counters, queue depth, request-latency quantiles, per-bucket runs)

Programmatic use: ``SamplerEngine`` without the HTTP wrapper.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hdmoe_tpu.adapters import make_text_encoder, make_vae
from hdmoe_tpu.models.configs import HDMOEMConfig
from hdmoe_tpu.models.hdmoem import precond_apply
from hdmoe_tpu.ops import mp as mp_ops
from hdmoe_tpu.sampler.edm import EDMSamplerConfig, make_denoiser
from hdmoe_tpu.sampler.dpm import make_sampler, solver_nfe
from hdmoe_tpu.train.optim import project_mp_weights


class SamplerEngine:
    """AOT-compiled fixed-batch sampler with weight folding.

    With ``mesh`` (a jax Mesh carrying a ``data`` axis) the executable is
    compiled data-parallel: the batch shards over ``data``, parameters
    replicate, and every chip denoises its batch slice — the serving-side
    analog of the training mesh (per-chip throughput is unchanged; the
    engine batch must divide the data axis size).
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
        mesh: Optional[Any] = None,
        data_axis: str = "data",
        solver: str = "heun",
        quantize: str = "none",
    ):
        self.cfg = cfg
        self.batch = batch
        self.mesh = mesh
        self.num_steps = num_steps
        self.guidance = guidance
        self.vae_kind = vae_kind
        self.text_kind = text_kind
        self.solver = solver
        self.nfe = solver_nfe(solver, num_steps)
        self.params = project_mp_weights(params)
        # weight-only int8: quantize the folded (projected) weights once on
        # the host; the compiled program takes int8 leaves + scales as its
        # param inputs and dequantizes in-graph (ops/quant.py — size claim,
        # not a speed claim; convs are MXU-lane-bound, PERF.md)
        if quantize == "int8":
            from hdmoe_tpu.ops.quant import quantize_tree_int8

            self.params = quantize_tree_int8(self.params)
        elif quantize != "none":
            raise ValueError(f"unknown quantize {quantize!r} (none | int8)")
        self.quantize = quantize
        self.vae = make_vae(vae_kind, target_std=cfg.sigma_data)
        self.clip = make_text_encoder(text_kind, width=cfg.text_emb_dim) if cfg.text_emb_dim else None
        scfg = EDMSamplerConfig(num_steps=num_steps, guidance=guidance)
        solve = make_sampler(solver)
        # CFG needs the unconditional (empty-prompt) embedding as the lerp
        # reference (sampler/generate.py:83-84); without it make_denoiser's
        # fallback makes the guidance lerp an identity, so guidance != 1.0
        # was silently inert in the engine (round-3 fix; test_serve.py::
        # test_engine_guidance_active pins it).
        uncond = (
            self.clip.encode_text([""] * batch)
            if (guidance != 1.0 and self.clip is not None)
            else None
        )

        def sample_fn(p, noise, text_emb, k):
            if quantize == "int8":
                from hdmoe_tpu.ops.quant import dequantize_tree

                p = dequantize_tree(p)
            def precond_fn(x, sigma, te, m1, m2, zeta, transition_point, softness):
                return precond_apply(
                    p, cfg, x, sigma, te, m1, m2, zeta,
                    transition_point=transition_point, softness=softness,
                )

            den = make_denoiser(precond_fn, cfg.num_experts, transition_point, softness,
                                guidance=guidance, uncond_text_emb=uncond)
            return solve(den, noise, text_emb, scfg, key=k)

        shape = (batch, cfg.img_resolution, cfg.img_resolution, cfg.in_channels)
        text_shape = (batch, 77, cfg.text_emb_dim) if cfg.text_emb_dim else None

        jit_kw = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape[data_axis]
            assert batch % n_data == 0, f"batch {batch} must divide data axis {n_data}"
            rep = NamedSharding(mesh, P())
            row = NamedSharding(mesh, P(data_axis))
            jit_kw = {
                "in_shardings": (rep, row, row if text_shape is not None else rep, rep),
                "out_shardings": row,
            }
            self.params = jax.device_put(self.params, rep)

        params_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.params
        )
        noise_spec = jax.ShapeDtypeStruct(shape, jnp.float32)
        key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
        text_spec = (
            jax.ShapeDtypeStruct(text_shape, jnp.float32)
            if text_shape is not None
            else jax.ShapeDtypeStruct((1,), jnp.float32)  # unused placeholder
        )
        # the pure 4-arg program + its specs, kept for re-tracing (deploy.py
        # exports the same function with the folded params baked in)
        self._fn4 = sample_fn if text_shape is not None else (lambda p, n, t, k: sample_fn(p, n, None, k))
        self._specs = (params_spec, noise_spec, text_spec, key_spec)
        with mp_ops.prenormalized_weights():
            self._sample_aot = (
                jax.jit(self._fn4, **jit_kw)
                .lower(params_spec, noise_spec, text_spec, key_spec)
                .compile()
            )
        self._has_text = text_shape is not None
        self._text_placeholder = jnp.zeros((1,), jnp.float32)

    def update_params(self, params) -> None:
        """Swap new (unfolded) weights into the SAME AOT executable — params
        are an input of the compiled program, so no retrace/recompile. Used
        by the in-training evaluator (train/evalhook.py) to score the live
        training state every eval_interval."""
        if not hasattr(self, "_project_jit"):
            self._project_jit = jax.jit(project_mp_weights)
        p = self._project_jit(params)
        if self.quantize == "int8":
            from hdmoe_tpu.ops.quant import quantize_tree_int8

            p = quantize_tree_int8(p)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            p = jax.device_put(p, NamedSharding(self.mesh, P()))
        self.params = p

    def _sample(self, *args):
        """(noise, text?, key) -> latents through the AOT executable."""
        if self._has_text:
            noise, text, k = args
        else:
            noise, k = args
            text = self._text_placeholder
        return self._sample_aot(self.params, noise, text, k)

    def sample(self, prompts: List[str], seed: int = 0) -> np.ndarray:
        """Sample len(prompts) images (padded internally to the engine batch).

        NOT thread-safe — wrap in :class:`BatchingFrontend` for concurrent use.
        """
        return self.sample_coalesced([(prompts, seed)])[0]

    def sample_coalesced(self, requests: List[tuple]) -> List[np.ndarray]:
        """Run several (prompts, seed) requests as ONE compiled batch.

        Each request's noise slice is drawn from its own seed (row i of the
        request's full-batch draw), so a request's images are independent of
        which other requests it shares the batch with, except for the churn
        renoise stream (shared, keyed by the first request's seed; with the
        default S_churn=0 churn is inactive and coalescing is exact).
        """
        return self.fetch_dispatched(self.dispatch_coalesced(requests))

    def dispatch_coalesced(self, requests: List[tuple]) -> "_PendingBatch":
        """Device-side half of :meth:`sample_coalesced`: enqueue the denoiser
        scan + VAE decode and return an in-flight handle WITHOUT fetching
        pixels to the host.

        JAX dispatch is asynchronous, so this returns as soon as the work is
        queued — the pipelined :class:`BatchingFrontend` dispatches batch
        N+1 before fetching batch N, overlapping the next batch's device
        compute with the previous batch's D2H transfer + per-request host
        work (the gap scripts/serve_latency_r3.py priced: the end-to-end
        request path ran well below the raw sampler rate).
        """
        shape = (self.batch, self.cfg.img_resolution, self.cfg.img_resolution, self.cfg.in_channels)
        noise, all_prompts, total, k_churn = _assemble_requests(requests, self.batch, shape)
        if self.clip is not None:
            padded = all_prompts + [""] * (self.batch - total)
            text = self.clip.encode_text(padded)
            latents = self._sample(noise, text, k_churn)
        else:
            latents = self._sample(noise, k_churn)
        return _PendingBatch(self.vae.decode(latents), requests)

    def fetch_dispatched(self, pending: "_PendingBatch") -> List[np.ndarray]:
        """Host-side half of :meth:`sample_coalesced`: block on the device
        result, fetch the pixels, and split them back per request."""
        return _split_results(np.asarray(pending.images_dev), pending.requests)


class _PendingBatch(NamedTuple):
    """In-flight coalesced batch: device pixel array + the request split."""

    images_dev: Any
    requests: List[tuple]


def _assemble_requests(requests: List[tuple], batch: int, shape: tuple):
    """Coalesce (prompts, seed) requests into one noise batch.

    Each request's noise rows are drawn from its own seed (row i of that
    seed's full-batch draw), so a request's images do not depend on which
    other requests share the compiled batch. Shared by :class:`SamplerEngine`
    and :class:`hdmoe_tpu.deploy.ExportedSampler`.
    """
    total = sum(len(p) for p, _ in requests)
    assert total <= batch, f"coalesced {total} exceeds engine batch {batch}"
    k0_noise, k_churn = jax.random.split(jax.random.PRNGKey(requests[0][1]))
    noise = jax.random.normal(k0_noise, shape)
    all_prompts: List[str] = []
    row = 0
    for prompts, seed in requests:
        n = len(prompts)
        if row > 0:  # later requests overwrite their rows from their own seed
            k_noise, _ = jax.random.split(jax.random.PRNGKey(seed))
            noise = noise.at[row : row + n].set(jax.random.normal(k_noise, shape)[:n])
        all_prompts.extend(prompts)
        row += n
    return noise, all_prompts, total, k_churn


def _split_results(images: np.ndarray, requests: List[tuple]) -> List[np.ndarray]:
    out, row = [], 0
    for prompts, _ in requests:
        out.append(images[row : row + len(prompts)])
        row += len(prompts)
    return out


class BucketedEngine:
    """Several fixed-batch AOT executables behind one engine interface.

    A single ``SamplerEngine`` pads every request to its compiled batch, so
    a 1-prompt request pays full-batch latency. Buckets compile one
    executable per size (e.g. ``(1, 4, 16)``) and route each coalesced
    request set to the smallest bucket it fits — tail latency scales with
    the request, throughput with the biggest bucket. Costs one AOT compile
    per bucket at startup (expensive through a slow TPU tunnel — keep the
    bucket list short in production).

    Drop-in for :class:`SamplerEngine` wherever ``batch``, ``sample``, and
    ``sample_coalesced`` are used (``BatchingFrontend``, ``serve``).
    Cross-bucket consistency: a request's noise rows are the leading rows
    of its seed's draw in EVERY bucket (jax PRNG counters are laid out
    row-major), so with per-sample dispatch (``dispatch="dense"``) the same
    request produces the same images whichever bucket runs it; capacity
    dispatch ranks across the padded batch, so there bucket choice can
    shift drop patterns (same caveat as coalescing itself).
    """

    def __init__(self, cfg: HDMOEMConfig, params: Any, buckets=(1, 4, 16), **engine_kw):
        assert len(buckets) > 0 and sorted(set(buckets)) == sorted(buckets), buckets
        self.buckets = tuple(sorted(buckets))
        self.engines = {b: SamplerEngine(cfg, params, batch=b, **engine_kw) for b in self.buckets}
        self.cfg = cfg
        self.batch = self.buckets[-1]  # frontend coalescing cap
        biggest = self.engines[self.batch]
        self.vae, self.clip = biggest.vae, biggest.clip
        self.nfe, self.solver = biggest.nfe, biggest.solver
        self.last_bucket: Optional[int] = None  # observability + tests

    def pick_bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise AssertionError(f"request of {n} exceeds largest bucket {self.batch}")

    def sample(self, prompts: List[str], seed: int = 0) -> np.ndarray:
        return self.sample_coalesced([(prompts, seed)])[0]

    def sample_coalesced(self, requests: List[tuple]) -> List[np.ndarray]:
        return self.fetch_dispatched(self.dispatch_coalesced(requests))

    def dispatch_coalesced(self, requests: List[tuple]) -> "_PendingBucket":
        total = sum(len(p) for p, _ in requests)
        self.last_bucket = self.pick_bucket(total)
        eng = self.engines[self.last_bucket]
        return _PendingBucket(eng.dispatch_coalesced(requests), eng)

    def fetch_dispatched(self, pending: "_PendingBucket") -> List[np.ndarray]:
        return pending.engine.fetch_dispatched(pending.pending)


class _PendingBucket(NamedTuple):
    """In-flight bucketed batch: the inner handle + the engine that owns it."""

    pending: _PendingBatch
    engine: SamplerEngine


class ServeMetrics:
    """Thread-safe serving counters + latency quantiles.

    The reference has no serving layer, so no metrics analog exists there;
    this is the production-observability half of ``serve.py`` — rendered in
    Prometheus text exposition format at ``GET /metrics``. Request latency
    includes queue wait (what a caller feels); quantiles come from a
    bounded ring of the most recent requests."""

    def __init__(self, window: int = 1024):
        from collections import deque

        self._lock = threading.Lock()
        self.requests_total = 0
        self.images_total = 0
        self.errors_total = 0
        self.runs_total = 0
        self.bucket_runs: dict = {}
        self._lat_sum = 0.0
        self._lat = deque(maxlen=window)

    def record_request(self, n_images: int, wall_s: float, error: bool):
        with self._lock:
            self.requests_total += 1
            if error:
                self.errors_total += 1
            else:
                self.images_total += n_images
            self._lat_sum += wall_s
            self._lat.append(wall_s)

    def record_run(self, bucket: Optional[int]):
        with self._lock:
            self.runs_total += 1
            if bucket is not None:
                self.bucket_runs[bucket] = self.bucket_runs.get(bucket, 0) + 1

    def render(self, queue_depth: int = 0) -> str:
        """Prometheus text exposition format (0.0.4)."""
        with self._lock:
            lines = [
                "# TYPE hdmoe_requests_total counter",
                f"hdmoe_requests_total {self.requests_total}",
                "# TYPE hdmoe_images_total counter",
                f"hdmoe_images_total {self.images_total}",
                "# TYPE hdmoe_errors_total counter",
                f"hdmoe_errors_total {self.errors_total}",
                "# TYPE hdmoe_runs_total counter",
                f"hdmoe_runs_total {self.runs_total}",
                "# TYPE hdmoe_queue_depth gauge",
                f"hdmoe_queue_depth {queue_depth}",
            ]
            lines.append("# TYPE hdmoe_bucket_runs_total counter")
            for b in sorted(self.bucket_runs):
                lines.append(f'hdmoe_bucket_runs_total{{bucket="{b}"}} {self.bucket_runs[b]}')
            lines.append("# TYPE hdmoe_request_latency_seconds summary")
            lat = sorted(self._lat)
            for q in (0.5, 0.95, 0.99):
                if lat:
                    v = lat[min(len(lat) - 1, int(q * len(lat)))]
                    lines.append(f'hdmoe_request_latency_seconds{{quantile="{q}"}} {v:.6f}')
            lines.append(f"hdmoe_request_latency_seconds_sum {self._lat_sum:.6f}")
            lines.append(f"hdmoe_request_latency_seconds_count {self.requests_total}")
        return "\n".join(lines) + "\n"


class BatchingFrontend:
    """Thread-safe queue in front of a SamplerEngine.

    One worker thread owns the engine; concurrent ``submit`` calls enqueue
    and the worker coalesces as many queued requests as fit in the engine
    batch into a single compiled run (round-1 review: ThreadingHTTPServer
    dispatched concurrent POSTs straight into ``engine.sample``).

    With ``pipeline=True`` (default) the worker keeps ONE batch in flight:
    it dispatches batch N+1's device work (async JAX dispatch — the call
    returns once enqueued) before fetching batch N's pixels, so the next
    batch's denoiser scan overlaps the previous batch's D2H transfer and
    per-request host work. Under back-to-back load this moves the served
    rate toward the raw sampler rate (scripts/serve_latency_r3.json priced
    the sequential request path well below it); a lone request is fetched
    immediately (the queue is empty), so tail latency is unchanged."""

    def __init__(self, engine: SamplerEngine, pipeline: bool = True):
        self.engine = engine
        self.pipeline = pipeline
        self.metrics = ServeMetrics()
        self._q: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, prompts: List[str], seed: int = 0) -> np.ndarray:
        """Blocking: enqueue and wait for this request's images."""
        assert len(prompts) <= self.engine.batch
        item = {"prompts": prompts, "seed": seed, "done": threading.Event()}
        t0 = time.perf_counter()
        self._q.put(item)
        item["done"].wait()
        self.metrics.record_request(
            len(prompts), time.perf_counter() - t0, error="error" in item
        )
        if "error" in item:
            raise item["error"]
        return item["result"]

    def _run(self):
        pending = None  # (in-flight handle, its batch_items)
        while True:
            if pending is not None:
                try:
                    first = self._q.get_nowait()
                except queue.Empty:
                    # nothing new queued while the device works: fetch now
                    self._finish(pending)
                    pending = None
                    continue
            else:
                first = self._q.get()
            batch_items = [first]
            room = self.engine.batch - len(first["prompts"])
            # coalesce whatever is already queued and fits
            while room > 0:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if len(nxt["prompts"]) <= room:
                    batch_items.append(nxt)
                    room -= len(nxt["prompts"])
                else:  # doesn't fit: run it in its own later batch
                    self._q.put(nxt)
                    break
            dispatched = None
            try:
                handle = self.engine.dispatch_coalesced(
                    [(it["prompts"], it["seed"]) for it in batch_items]
                )
                # bucket captured NOW: by finish time a later dispatch may
                # have overwritten engine.last_bucket (pipelining)
                dispatched = (handle, batch_items,
                              getattr(self.engine, "last_bucket", None))
            except Exception as e:  # noqa: BLE001 — handed back to the callers
                for it in batch_items:
                    it["error"] = e
                self.metrics.record_run(getattr(self.engine, "last_bucket", None))
                for it in batch_items:
                    it["done"].set()
            # deliver the PREVIOUS batch only after the next one is enqueued
            if pending is not None:
                self._finish(pending)
                pending = None
            if dispatched is not None:
                if self.pipeline:
                    pending = dispatched
                else:
                    self._finish(dispatched)

    def _finish(self, dispatched):
        """Fetch an in-flight batch and hand each request its images.

        Device-side errors surface at the fetch (async dispatch defers
        them), so the error path here mirrors the dispatch-time one."""
        handle, batch_items, bucket = dispatched
        try:
            results = self.engine.fetch_dispatched(handle)
            for it, res in zip(batch_items, results):
                it["result"] = res
        except Exception as e:  # noqa: BLE001 — handed back to the callers
            for it in batch_items:
                it["error"] = e
        finally:
            self.metrics.record_run(bucket)
            for it in batch_items:
                it["done"].set()


def make_server(engine: SamplerEngine, host: str = "127.0.0.1", port: int = 8777,
                pipeline: bool = True, frontend: Optional[Any] = None):
    """Build (but don't start) the HTTP server; ``port=0`` binds a free one.

    Returns a ``ThreadingHTTPServer`` whose actual port is
    ``server_address[1]`` — tests use port 0 so concurrent pytest processes
    never collide on a fixed port. ``frontend`` overrides the default
    :class:`BatchingFrontend` with any object exposing
    ``submit(prompts, seed)`` / ``metrics`` / ``_q`` (e.g. the continuous-
    batching :class:`hdmoe_tpu.serve_stream.StreamingFrontend`)."""
    if frontend is None:
        frontend = BatchingFrontend(engine, pipeline=pipeline)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                payload = {"ok": True, "device": str(jax.devices()[0]), "batch": engine.batch}
                if hasattr(engine, "buckets"):
                    payload["buckets"] = list(engine.buckets)
                self._json(200, payload)
            elif self.path == "/metrics":
                body = frontend.metrics.render(queue_depth=frontend._q.qsize()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                prompts = req.get("prompts")
                if not isinstance(prompts, list) or not prompts:
                    self._json(400, {"error": "'prompts' must be a non-empty list"})
                    return
                if len(prompts) > engine.batch:
                    self._json(400, {"error": f"at most {engine.batch} prompts per request"})
                    return
                t0 = time.perf_counter()
                images = frontend.submit([str(p) for p in prompts], seed=int(req.get("seed", 0)))
                fmt = "raw" if req.get("format") == "raw" else "png"
                if fmt == "raw":
                    payload_images = images.tolist()
                else:
                    from PIL import Image

                    payload_images = []
                    for img in images:
                        buf = io.BytesIO()
                        Image.fromarray(img).save(buf, format="PNG")
                        payload_images.append(base64.b64encode(buf.getvalue()).decode())
                self._json(
                    200,
                    {
                        "images": payload_images,
                        "format": fmt,
                        "shape": list(images.shape),
                        "latency_ms": round((time.perf_counter() - t0) * 1000.0, 1),
                    },
                )
            except Exception as e:  # serving layer: report, don't crash
                self._json(500, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def serve(engine: SamplerEngine, host: str = "127.0.0.1", port: int = 8777,
          pipeline: bool = True, frontend: Optional[Any] = None):
    """Blocking HTTP server around a SamplerEngine (queued + coalescing)."""
    httpd = make_server(engine, host, port, pipeline=pipeline, frontend=frontend)
    print(f"serving on http://{host}:{httpd.server_address[1]} (batch={engine.batch})")
    httpd.serve_forever()
