"""Weight-only int8 quantization for serving and deployment artifacts.

Capability extension beyond the reference (which serves fp32 torch
checkpoints; no quantization anywhere in /root/reference). Serving-side
motivation on TPU:

- **artifact/HBM size**: the magnitude-preserving weights under ``"mpw"``
  dominate the parameter bytes; int8 + one fp32 scale per output channel
  is a ~4x reduction over fp32 (deploy.py artifacts shrink accordingly);
- **bandwidth**: weight fetches halve vs bf16 — marginal at the flagship's
  compute-bound batch-32 operating point (convs are MXU-lane-bound,
  PERF.md), so the honest claim is size, not speed;
- **accuracy**: MP weights are normalized per output channel (ops/mp.py
  ``normalize``), so their dynamic range is tame and symmetric per-channel
  int8 keeps relative error ~<= 1/127 per channel max (tested).

Design: the quantized tree keeps the SAME pytree topology as the source
params except each selected leaf becomes a ``{"__q8__": int8[...],
"q8_scale": f32[...]}`` subtree. ``dequantize_tree`` is jittable and runs
INSIDE the compiled sampler program, so XLA fuses the dequant multiply
into the first consumer where profitable and the AOT/export paths carry
int8 constants.

Export caveat: baking int8 constants lets XLA constant-fold the dequant
and re-fuse around it, so exported-artifact images are numerically
equivalent to the live engine's (>= 99.9% of uint8 pixels bit-equal,
tests/test_quant.py) rather than bit-identical like the fp32 artifact.

Only the magnitude-preserving conv/linear weights (dict key ``"mpw"``,
the repo-wide convention — optimizer projection and sharding rules key
off the same name) are quantized; gains, biases, and Fourier tables stay
fp32.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

_Q_KEY = "__q8__"
_S_KEY = "q8_scale"


def _quantize_leaf(w: jnp.ndarray) -> dict:
    """Symmetric per-output-channel int8 quantization.

    mpw weights are torch-ordered (out, in[, kh, kw]) (ops/mp.py
    mp_conv_init), and MP normalization is per output channel = per
    leading-axis row — so the scale reduces over every axis EXCEPT axis 0,
    giving one scale per output channel (shape (O, 1[, 1, 1]), broadcast
    by the dequant multiply).
    """
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(1, w.ndim)), keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {_Q_KEY: q, _S_KEY: scale.astype(jnp.float32)}


def _dequantize_leaf(d: dict) -> jnp.ndarray:
    return d[_Q_KEY].astype(jnp.float32) * d[_S_KEY]


def _is_qleaf(x: Any) -> bool:
    return isinstance(x, dict) and _Q_KEY in x


def quantize_tree_int8(params: Any) -> Any:
    """Quantize every ``"mpw"`` leaf of a plain-dict param tree to int8.

    Returns a tree of the same nesting where each mpw ndarray is replaced
    by its ``{"__q8__", "q8_scale"}`` subtree. Idempotent-unsafe by design:
    quantizing an already-quantized tree raises.
    """

    def walk(node: Any) -> Any:
        if _is_qleaf(node):
            raise ValueError("tree is already int8-quantized")
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "mpw":
                    if _is_qleaf(v):
                        raise ValueError("tree is already int8-quantized")
                    out[k] = _quantize_leaf(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def dequantize_tree(params: Any) -> Any:
    """Jittable inverse of :func:`quantize_tree_int8` (non-q leaves pass
    through untouched, so fp32 trees are a no-op)."""

    def walk(node: Any) -> Any:
        if _is_qleaf(node):
            return _dequantize_leaf(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def tree_bytes(params: Any) -> int:
    """Total parameter bytes (for the size-reduction claim in tests/docs)."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, "dtype")
    )


def quantization_error(params: Any) -> Tuple[float, float]:
    """(max, mean) relative error of the int8 roundtrip over mpw leaves."""
    errs = []

    def walk(node: Any):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "mpw":
                    w = jnp.asarray(v, jnp.float32)
                    rt = _dequantize_leaf(_quantize_leaf(w))
                    denom = jnp.maximum(jnp.max(jnp.abs(w)), 1e-12)
                    errs.append(float(jnp.max(jnp.abs(rt - w)) / denom))
                else:
                    walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    if not errs:
        return 0.0, 0.0
    return max(errs), sum(errs) / len(errs)
