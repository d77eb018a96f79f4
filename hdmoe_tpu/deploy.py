"""Serialized serving artifacts: ship the compiled sampler, not the model.

The reference "deploys" by unpickling the full torch module from a training
checkpoint (reference Utils/training.py:236-249 save/load of model objects);
TPU-native serving wants the opposite: one ahead-of-time traced program with
the folded MP weights baked in as constants, serialized as StableHLO via
``jax.export``. The loaded artifact needs no model code, no params
checkpoint, and no config — only a JAX runtime — and is stable across
process/host boundaries (``jax.export`` versions the custom-call ABI).

Artifact = a single zip file:

  meta.json     batch/steps/shapes/adapter kinds + jax version + platforms
  sampler.bin   ``jax.export`` bytes: (noise, text?, key) -> uint8 images
                (EDM sampling + VAE decode in ONE program)
  exec_<backend>.pkl   OPTIONAL (``precompile=True``): the fully compiled
                PJRT executable (``jax.experimental.serialize_executable``),
                tagged with the device kind. A loader on a matching device
                skips XLA compilation entirely — measured on the v5e
                serving boot path in artifacts/serve_coldstart_r4.json —
                and falls back to the StableHLO program on any mismatch
                or deserialization failure.

Design notes (TPU-first):

- Weights are baked as program constants. At flagship scale the folded
  param tree is a few MB — embedding it makes the artifact self-contained
  and lets XLA constant-fold the weight normalization that remains.
- The VAE *decode* is traced into the exported program, so the hot path
  (latents -> pixels) never re-enters Python. Text encoding stays outside:
  it is tokenizer/string work, not tensor work; the artifact records the
  encoder kind and the loader re-instantiates it.
- ``platforms=("cpu", "tpu")`` cross-lowers by default so an artifact
  exported in a CPU CI job runs on TPU serving hosts. Configs whose
  compiled path contains Pallas kernels (``use_flash=True``,
  ``conv_impl="pallas"``; Mosaic lowering is per-backend) export for the
  current backend only — ``export_sampler`` narrows automatically and
  records the fact in meta.json.
- Numerical contract: the deserialized module recompiles as a fresh XLA
  program whose fusion choices can differ from the live engine's jit. In
  fp32 the loaded artifact is bit-identical (pinned on CPU,
  tests/test_deploy.py); under bf16 (the serving fast path) re-fusion can
  flip isolated uint8 pixels on rounding knife edges — measured on real
  TPU at flagship scale in artifacts/deploy_r3.json (same effect as baked
  int8 constants, tests/test_quant.py). Equality contract there:
  <= 0.1% pixels differing, mean |diff| < 0.5.

Usage:
    engine = SamplerEngine(cfg, params, batch=16, num_steps=18)
    export_sampler(engine, "flagship.hdmoe")
    ...
    sampler = load_sampler("flagship.hdmoe")      # no model code needed
    imgs = sampler.sample(["a photo of a flower"], seed=0)

CLI: ``python -m hdmoe_tpu export ...`` / ``python -m hdmoe_tpu serve
--artifact flagship.hdmoe``.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hdmoe_tpu.adapters import make_text_encoder
from hdmoe_tpu.ops import mp as mp_ops
from hdmoe_tpu.serve import (SamplerEngine, _PendingBatch, _assemble_requests,
                             _split_results)

_FORMAT_VERSION = 1


def _uses_pallas(cfg) -> bool:
    """Pallas/Mosaic lowering is backend-specific: such programs cannot be
    cross-lowered for a platform that is not the current backend."""
    return bool(getattr(cfg, "use_flash", False)) or \
        getattr(cfg, "conv_impl", "xla") == "pallas" or \
        getattr(cfg, "dispatch", "") == "pallas" or \
        getattr(cfg, "attention_impl", "dense") in ("flash", "ring")


def export_sampler(
    engine: SamplerEngine,
    path: str,
    platforms: Optional[tuple] = None,
    precompile: bool = False,
) -> Dict[str, Any]:
    """Export ``engine``'s sampler (+ VAE decode) to a self-contained file.

    Returns the artifact's meta dict. ``platforms`` defaults to
    ``("cpu", "tpu")`` for portable programs and to the current backend when
    the config's compiled path contains Pallas kernels (see module notes).
    ``precompile=True`` additionally embeds the serialized COMPILED
    executable for the current backend/device kind, so a matching serving
    host boots without any XLA compile (see module notes).
    """
    from jax import export as jexport

    if engine.mesh is not None:
        raise ValueError(
            "export_sampler serializes a single-device program; construct the "
            "engine without a mesh (DP-sharded serving re-jits at load site)"
        )
    cfg = engine.cfg
    backend = jax.default_backend()
    if platforms is None:
        platforms = (backend,) if _uses_pallas(cfg) else ("cpu", "tpu")
    _, noise_spec, text_spec, key_spec = engine._specs
    params = engine.params  # folded; baked into the program as constants

    def program(noise, text, key):
        latents = engine._fn4(params, noise, text, key)
        return engine.vae.decode(latents)

    with mp_ops.prenormalized_weights():
        try:
            exp = jexport.export(jax.jit(program), platforms=platforms)(
                noise_spec, text_spec, key_spec
            )
        except ValueError as e:
            if "custom call" not in str(e).lower():
                raise
            # Mosaic TPU kernels serialize as tpu_custom_call; if this jax
            # version doesn't list it as guaranteed-stable, allow it
            # explicitly — the artifact is then pinned to a compatible
            # runtime, which the per-backend `platforms` narrowing for
            # Pallas configs already implies.
            allow = jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")
            exp = jexport.export(
                jax.jit(program), platforms=platforms, disabled_checks=[allow]
            )(noise_spec, text_spec, key_spec)

    exec_blob = None
    if precompile:
        import pickle

        from jax.experimental import serialize_executable as _se

        with mp_ops.prenormalized_weights():
            compiled = jax.jit(program).lower(
                noise_spec, text_spec, key_spec).compile()
        payload, in_tree, out_tree = _se.serialize(compiled)
        exec_blob = pickle.dumps(
            {"payload": payload, "in_tree": in_tree, "out_tree": out_tree,
             "device_kind": jax.devices()[0].device_kind,
             "jax_version": jax.__version__})

    meta = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exp.platforms),
        "export_backend": backend,
        "batch": engine.batch,
        "num_steps": engine.num_steps,
        "solver": engine.solver,
        "nfe": engine.nfe,
        "quantize": engine.quantize,
        "guidance": engine.guidance,
        "img_resolution": cfg.img_resolution,
        "in_channels": cfg.in_channels,
        "text_emb_dim": cfg.text_emb_dim,
        "has_text": engine._has_text,
        "text_kind": engine.text_kind,
        "vae_kind": engine.vae_kind,
        "decode_included": True,
        "uses_pallas": _uses_pallas(cfg),
        "precompiled_backend": backend if exec_blob is not None else None,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("sampler.bin", exp.serialize())
        if exec_blob is not None:
            z.writestr(f"exec_{backend}.pkl", exec_blob)
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return meta


class ExportedSampler:
    """A loaded sampler artifact with the :class:`SamplerEngine` request API
    (``sample`` / ``sample_coalesced`` / ``batch``), so it drops into
    :class:`hdmoe_tpu.serve.BatchingFrontend` and ``serve()`` unchanged."""

    def __init__(self, path: str):
        from jax import export as jexport

        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read("meta.json"))
            blob = z.read("sampler.bin")
            backend = jax.default_backend()
            exec_name = f"exec_{backend}.pkl"
            exec_blob = (z.read(exec_name)
                         if exec_name in z.namelist() else None)
        if self.meta.get("format_version", 0) > _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format_version']} is newer than "
                f"this loader ({_FORMAT_VERSION})"
            )
        if backend not in self.meta["platforms"]:
            raise ValueError(
                f"artifact was exported for {self.meta['platforms']}, current "
                f"backend is {backend}"
            )
        # Boot strategy: if a precompiled executable for this backend is
        # embedded and the device kind matches, use it — zero XLA compile at
        # boot. Robustness: some environment mismatches only surface at
        # EXECUTION (e.g. a rehydrated device assignment that disagrees with
        # the local topology), so the first call runs guarded and any
        # failure transparently re-enters the StableHLO path (which then
        # jit-compiles as usual). ``loaded_precompiled`` reports which path
        # is live.
        # TRUST BOUNDARY: the precompiled path pickle.loads an executable
        # record from the artifact — loading an UNTRUSTED .hdmoe file is
        # arbitrary code execution (pickle), and even the StableHLO path
        # runs whatever program the artifact encodes. Artifacts must come
        # from a trusted `hdmoe_tpu export` of your own; treat them like
        # wheels, not like data files. HDMOE_PRECOMPILED=off disables the
        # pickle path entirely (StableHLO-only boot, narrower parse
        # surface) without touching the artifact. (Round-4 advisor finding.)
        self._stablehlo_blob = blob
        self._call = None
        self.loaded_precompiled = False
        if os.environ.get("HDMOE_PRECOMPILED", "").lower() in ("off", "0", "none"):
            exec_blob = None
        if exec_blob is not None:
            import pickle

            try:
                rec = pickle.loads(exec_blob)
                if rec["device_kind"] != jax.devices()[0].device_kind:
                    raise ValueError(
                        f"precompiled for {rec['device_kind']!r}, device is "
                        f"{jax.devices()[0].device_kind!r}")
                from jax.experimental import serialize_executable as _se

                loaded = _se.deserialize_and_load(
                    rec["payload"], rec["in_tree"], rec["out_tree"])
                self._call = self._guarded(loaded)
                self.loaded_precompiled = True
            except Exception as e:  # noqa: BLE001 — any failure => fallback
                self._fallback_note(e, "load")
        if self._call is None:
            self._use_stablehlo()
        self.batch = int(self.meta["batch"])
        self._has_text = bool(self.meta["has_text"])
        self._shape = (
            self.batch,
            int(self.meta["img_resolution"]),
            int(self.meta["img_resolution"]),
            int(self.meta["in_channels"]),
        )
        self.clip = (
            make_text_encoder(self.meta["text_kind"], width=int(self.meta["text_emb_dim"]))
            if self._has_text
            else None
        )
        self._text_placeholder = jnp.zeros((1,), jnp.float32)

    def _use_stablehlo(self):
        from jax import export as jexport

        exp = jexport.deserialize(self._stablehlo_blob)
        self._call = jax.jit(exp.call)  # compile once per shape on first use
        self.loaded_precompiled = False

    def _guarded(self, loaded):
        state = {"proven": False}

        def call(*args):
            if state["proven"]:
                return loaded(*args)
            try:
                out = loaded(*args)
                # async dispatch can surface an exec-time mismatch at the
                # RESULT FETCH (outside any caller try); block on the first
                # call so the failure lands here and triggers the fallback.
                # Later calls skip the barrier and pipeline normally.
                jax.block_until_ready(out)
                state["proven"] = True
                return out
            except Exception as e:  # noqa: BLE001 — exec-time mismatch
                self._fallback_note(e, "first execution")
                self._use_stablehlo()
                return self._call(*args)

        return call

    @staticmethod
    def _fallback_note(e: Exception, stage: str):
        import sys

        print(f"deploy: precompiled executable unusable at {stage} "
              f"({type(e).__name__}: {e}); falling back to StableHLO",
              file=sys.stderr, flush=True)

    def sample(self, prompts: List[str], seed: int = 0) -> np.ndarray:
        """Sample len(prompts) images. NOT thread-safe — wrap in
        :class:`hdmoe_tpu.serve.BatchingFrontend` for concurrent use."""
        return self.sample_coalesced([(prompts, seed)])[0]

    def sample_coalesced(self, requests: List[tuple]) -> List[np.ndarray]:
        return self.fetch_dispatched(self.dispatch_coalesced(requests))

    def dispatch_coalesced(self, requests: List[tuple]) -> _PendingBatch:
        """Staged half of the SamplerEngine request API (async enqueue of the
        exported program, pixels NOT fetched) — the pipelined
        BatchingFrontend drives artifact serving exactly like a live
        engine."""
        noise, all_prompts, total, k_churn = _assemble_requests(
            requests, self.batch, self._shape
        )
        if self.clip is not None:
            padded = all_prompts + [""] * (self.batch - total)
            text = self.clip.encode_text(padded)
        else:
            text = self._text_placeholder
        return _PendingBatch(self._call(noise, text, k_churn), requests)

    def fetch_dispatched(self, pending: _PendingBatch) -> List[np.ndarray]:
        return _split_results(np.asarray(pending.images_dev), pending.requests)


def load_sampler(path: str) -> ExportedSampler:
    """Load an artifact written by :func:`export_sampler`."""
    return ExportedSampler(path)
