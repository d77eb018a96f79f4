"""Numerical-stability debugging: the TPU-native 'sanitizer' subsystem.

The reference has no race detection or sanitizers (single-device; its only
guards are the loss clamps, utils.py:139-147 — SURVEY.md §5). The idiomatic
JAX equivalents provided here:

- ``nan_debug_mode()``: flip ``jax_debug_nans`` so any NaN produced inside a
  jitted computation raises at the producing op (recompiles un-fused —
  debug-only).
- ``checked(fn)``: wrap a function with ``checkify`` so NaN/div-by-zero/OOB
  errors become returned, inspectable errors rather than silent garbage.
- ``assert_all_finite(tree)``: host-side sweep over a pytree (params, grads,
  optimizer state) naming every non-finite leaf.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, List

import jax
import numpy as np
from jax.experimental import checkify


@contextlib.contextmanager
def nan_debug_mode():
    """Enable jax_debug_nans within a scope (forces eager-style NaN checks)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn: Callable, errors=checkify.float_checks) -> Callable:
    """checkify-wrap ``fn``: returns ``(error, out)``; call
    ``error.throw()`` to raise on any NaN/inf produced inside."""
    return checkify.checkify(fn, errors=errors)


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Raise with the exact paths of any non-finite leaves."""
    bad: List[str] = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} non-finite")
    if bad:
        raise FloatingPointError(f"non-finite values in {name}:\n  " + "\n  ".join(bad))
