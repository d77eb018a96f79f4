"""ctypes binding for the native (C++) data-generation runtime.

Loads ``native/libhdmoe_native.so`` (built by ``make -C native``; auto-built
on first use when a compiler is available) and exposes
``NativeSyntheticDataset`` — a drop-in replacement for
``train.data.SyntheticDataset`` whose whole-batch generation runs in
multithreaded C++ instead of per-image Python. Falls back to the Python
implementation when the library cannot be built/loaded.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libhdmoe_native.so"

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True, timeout=120
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.hdmoe_datagen_abi_version.restype = ctypes.c_int
        assert lib.hdmoe_datagen_abi_version() == 1
        lib.hdmoe_generate_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.c_int,
        ]
        lib.hdmoe_generate_batch.restype = None
        _lib = lib
    except Exception as e:  # no compiler / load failure -> Python fallback
        _load_error = str(e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeSyntheticDataset:
    """Batch-granular native dataset (same virtual-epoch contract as
    SyntheticDataset; images differ from the Python generator's — both are
    procedural flowers, the native one uses its own PRNG)."""

    def __init__(
        self, resolution: int = 256, size: int = 2048, seed: int = 0, n_threads: int = 0, cache: bool = True
    ):
        if _load() is None:
            raise RuntimeError(f"native datagen unavailable: {_load_error}")
        self.resolution = resolution
        self.size = size
        self.seed = seed
        self.n_threads = n_threads
        # one-shot epoch cache: the virtual epoch is finite and deterministic,
        # so generate each image once and serve repeats from memory
        self._cache: Optional[np.ndarray] = None
        self._cached_mask: Optional[np.ndarray] = None
        if cache:
            self._cache = np.zeros((size, resolution, resolution, 3), dtype=np.uint8)
            self._cached_mask = np.zeros((size,), dtype=bool)

    def __len__(self) -> int:
        return self.size

    def _generate(self, idx: np.ndarray) -> np.ndarray:
        b = len(idx)
        out = np.empty((b, self.resolution, self.resolution, 3), dtype=np.uint8)
        _lib.hdmoe_generate_batch(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            b,
            self.resolution,
            self.seed,
            self.n_threads,
        )
        return out

    def get_batch(self, indices: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(np.asarray(indices, dtype=np.int64) % self.size)
        if self._cache is None:
            return self._generate(idx)
        missing = idx[~self._cached_mask[idx]]
        if len(missing):
            missing = np.ascontiguousarray(np.unique(missing))
            self._cache[missing] = self._generate(missing)
            self._cached_mask[missing] = True
        return self._cache[idx]

    def get(self, idx: int) -> np.ndarray:
        return self.get_batch(np.asarray([idx]))[0]


def native_batch_iterator(dataset: NativeSyntheticDataset, batch_size: int, seed: int = 0, shuffle: bool = True):
    """Infinite epoch-shuffled batch stream using whole-batch native calls."""
    rng = np.random.RandomState(seed)
    n = len(dataset)
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n - batch_size + 1, batch_size):
            yield dataset.get_batch(order[start : start + batch_size])
