"""Data pipeline: dataset sources + async host->device prefetch.

Re-design of reference ``get_dataloader`` (Utils/training.py:226-239 —
torchvision Flowers102 train+val, resized, normalized, shuffled, drop-last).
TPU-first differences:

- batches are uint8 NHWC on the host and transferred once per step (the VAE
  adapter handles [0,255] -> latent); no per-sample Python transforms in the
  hot loop.
- a background prefetch thread overlaps host batch assembly + H2D transfer
  with device compute (double buffering).
- hermetic sources: ``synthetic_flowers`` needs no network/disk; torchvision
  datasets are gated on local availability (zero-egress environment).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_flowers(resolution: int = 256, seed: int = 0) -> "np.ndarray":
    """Procedural 'flower' image factory (deterministic, no I/O).

    Generates radially-symmetric petal patterns with random color palettes —
    enough visual/statistical structure (smooth regions, edges, color
    variety) to exercise the full VAE -> diffusion -> sampling stack
    hermetically.
    """
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:resolution, 0:resolution].astype(np.float32)
    cx = cy = resolution / 2.0
    r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2) / (resolution / 2.0)
    theta = np.arctan2(yy - cy, xx - cx)

    def make_one(k: int) -> np.ndarray:
        rs = np.random.RandomState(seed * 100003 + k)
        n_petals = rs.randint(4, 9)
        phase = rs.uniform(0, 2 * np.pi)
        petal = 0.55 + 0.35 * np.cos(n_petals * theta + phase)
        flower = np.clip(1.0 - r / np.maximum(petal, 1e-3), 0.0, 1.0) ** 0.7
        core = np.clip(1.0 - r / 0.18, 0.0, 1.0)
        fg = rs.uniform(0.3, 1.0, size=3)
        core_c = rs.uniform(0.5, 1.0, size=3)
        bg = rs.uniform(0.0, 0.45, size=3)
        img = (
            flower[..., None] * fg[None, None]
            + core[..., None] * core_c[None, None]
            + (1.0 - flower[..., None]) * bg[None, None]
        )
        noise = rs.randn(resolution, resolution, 3).astype(np.float32) * 0.02
        return (np.clip(img + noise, 0, 1) * 255).astype(np.uint8)

    return make_one


def device_flowers_batch(key, batch: int, resolution: int):
    """On-device synthetic flower batch: the jnp twin of ``synthetic_flowers``.

    Same procedural family (radial petal pattern, random palette, 2% pixel
    noise) sampled from a PRNG key instead of the numpy RandomState stream,
    fully vectorized over the batch — traceable inside the jitted train
    step, so ``dataset="synthetic-device"`` training pays ZERO host->device
    image transfer (round-3 feed measurement: the full loop was H2D/dispatch
    bound at ~165 img/s vs 644 img/s compute, and host-side generator
    choice made no difference — artifacts/feed_throughput_r3.json).

    Returns float32 NHWC in [0, 255] (what FakeVAE.encode consumes after
    its own /255 normalization; staying float avoids a pointless uint8
    round-trip inside the program).
    """
    yy, xx = jnp.mgrid[0:resolution, 0:resolution]
    cx = cy = resolution / 2.0
    r = jnp.sqrt((xx - cx) ** 2 + (yy - cy) ** 2).astype(jnp.float32) / (resolution / 2.0)
    theta = jnp.arctan2(yy - cy, xx - cx).astype(jnp.float32)

    kn, kp, kf, kc, kb, kz = jax.random.split(key, 6)
    n_petals = jax.random.randint(kn, (batch, 1, 1), 4, 9).astype(jnp.float32)
    phase = jax.random.uniform(kp, (batch, 1, 1), maxval=2 * jnp.pi)
    petal = 0.55 + 0.35 * jnp.cos(n_petals * theta[None] + phase)
    flower = jnp.clip(1.0 - r[None] / jnp.maximum(petal, 1e-3), 0.0, 1.0) ** 0.7
    core = jnp.clip(1.0 - r / 0.18, 0.0, 1.0)[None]
    fg = jax.random.uniform(kf, (batch, 1, 1, 3), minval=0.3, maxval=1.0)
    core_c = jax.random.uniform(kc, (batch, 1, 1, 3), minval=0.5, maxval=1.0)
    bg = jax.random.uniform(kb, (batch, 1, 1, 3), maxval=0.45)
    img = flower[..., None] * fg + core[..., None] * core_c + (1.0 - flower[..., None]) * bg
    img = img + jax.random.normal(kz, img.shape) * 0.02
    return jnp.clip(img, 0.0, 1.0) * 255.0


class SyntheticDataset:
    """Infinite deterministic image stream with a fixed virtual epoch size."""

    def __init__(self, resolution: int = 256, size: int = 2048, seed: int = 0):
        self.resolution = resolution
        self.size = size
        self._factory = synthetic_flowers(resolution, seed)
        self._cache: dict = {}

    def __len__(self):
        return self.size

    def get(self, idx: int) -> np.ndarray:
        idx = idx % self.size
        if idx not in self._cache:
            if len(self._cache) > 4096:
                self._cache.clear()
            self._cache[idx] = self._factory(idx)
        return self._cache[idx]


def torchvision_dataset(name: str, root: str, resolution: int):
    """Flowers-102 / CIFAR-10 via torchvision from a LOCAL root (no download;
    raises if absent — this environment has zero egress)."""
    from torchvision import datasets, transforms  # CPU torch is baked in

    tx = transforms.Compose([transforms.Resize((resolution, resolution))])
    if name == "flowers102":
        train = datasets.Flowers102(root=root, split="train", download=False, transform=tx)
        val = datasets.Flowers102(root=root, split="val", download=False, transform=tx)
        pairs = [train, val]
    elif name == "cifar10":
        pairs = [datasets.CIFAR10(root=root, train=True, download=False, transform=tx)]
    else:
        raise ValueError(name)

    class _Wrap:
        def __init__(self, ds_list):
            self.ds = ds_list
            self.lens = [len(d) for d in ds_list]
            self.size = sum(self.lens)
            self.resolution = resolution

        def __len__(self):
            return self.size

        def get(self, idx):
            idx = idx % self.size
            for d, n in zip(self.ds, self.lens):
                if idx < n:
                    img, _ = d[idx]
                    return np.asarray(img, dtype=np.uint8)
                idx -= n
            raise IndexError

    return _Wrap(pairs)


class ImageFolderDataset:
    """Real-image dataset from a directory tree of PNG/JPEG files (PIL).

    The reference trains on torchvision Flowers-102 (training.py:226-239);
    this environment ships neither torchvision nor the dataset, so the
    real-data path reads any local image folder (e.g. an extracted
    Flowers-102 ``jpg/`` directory) — recursive scan, deterministic order,
    resize to ``resolution``, uint8 NHWC.
    """

    EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

    def __init__(self, root: str, resolution: int = 256):
        import os

        self.resolution = resolution
        self.files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(root)
            for f in fs
            if f.lower().endswith(self.EXTS)
        )
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")

    def __len__(self):
        return len(self.files)

    def get(self, idx: int) -> np.ndarray:
        from PIL import Image

        with Image.open(self.files[idx % len(self.files)]) as im:
            im = im.convert("RGB").resize((self.resolution, self.resolution), Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)


def make_dataset(name: str = "synthetic", resolution: int = 256, root: str = "./data", seed: int = 0):
    if name == "synthetic":
        return SyntheticDataset(resolution=resolution, seed=seed)
    if name == "synthetic-device":
        # on-device generation (device_flowers_batch) — the host-side view
        # of this dataset (eval streams, FID real side) is the Python twin
        return SyntheticDataset(resolution=resolution, seed=seed)
    if name == "synthetic-native":
        from hdmoe_tpu.train.native_data import NativeSyntheticDataset, native_available

        if native_available():
            return NativeSyntheticDataset(resolution=resolution, seed=seed)
        return SyntheticDataset(resolution=resolution, seed=seed)
    if name == "imagefolder":
        return ImageFolderDataset(root, resolution)
    if name in ("flowers102", "cifar10"):
        try:
            return torchvision_dataset(name, root, resolution)
        except ImportError:
            # torchvision absent: fall back to a local image folder laid out
            # at <root>/<name> (e.g. the extracted Flowers-102 jpgs).
            import os

            return ImageFolderDataset(os.path.join(root, name), resolution)
    raise ValueError(f"unknown dataset '{name}'")


def batch_iterator(
    dataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    start_batch: int = 0,
    shard: Optional[Tuple[int, int]] = None,
) -> Iterator[np.ndarray]:
    """Infinite epoch-shuffled uint8 NHWC batch stream (drop-last).

    ``start_batch`` fast-forwards the deterministic stream: a resumed run
    passes its restored step count so it continues with the batches it has
    NOT yet seen instead of replaying epoch 0 (round-1 review finding).
    Skipped batches are never materialized — only the epoch permutations are
    regenerated, so fast-forward is O(epochs) cheap RNG work.

    ``shard=(process_index, process_count)`` is the multi-host contract
    (parallel/multihost.py): ``batch_size`` stays the GLOBAL batch, the
    permutation stays seed-deterministic and identical on every process, and
    each process materializes only its contiguous row-slice — slices from
    all processes concatenate (in process order) to exactly the unsharded
    stream's batch, which is what make_array_from_process_local_data
    reassembles.
    """
    if shard is not None:
        pid, nproc = shard
        if batch_size % nproc:
            raise ValueError(f"global batch {batch_size} must be divisible by the process count {nproc}")
    rng = np.random.RandomState(seed)
    n = len(dataset)
    per_epoch = len(range(0, n - batch_size + 1, batch_size))
    skip = start_batch
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        if skip >= per_epoch:
            skip -= per_epoch
            continue
        for b, start in enumerate(range(0, n - batch_size + 1, batch_size)):
            if b < skip:
                continue
            idx = order[start : start + batch_size]
            if shard is not None:
                local = batch_size // nproc
                idx = idx[pid * local : (pid + 1) * local]
            if hasattr(dataset, "get_batch"):
                yield dataset.get_batch(idx)
            else:
                yield np.stack([dataset.get(int(i)) for i in idx])
        skip = 0


def prefetch_to_device(it: Iterator[np.ndarray], size: int = 2, device=None) -> Iterator[jax.Array]:
    """Background-thread prefetch + H2D transfer (double buffering).

    ``device`` may be a Device, a Sharding, or a CALLABLE batch->jax.Array —
    the callable form covers multi-host assembly
    (multihost.host_local_to_global), where placement is not a plain
    device_put.

    Worker exceptions propagate to the consumer (re-raised from the main
    thread) rather than silently truncating the stream — the failure-recovery
    supervisor (train/resilient.py) depends on seeing the real error.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    if callable(device) and not hasattr(device, "device_kind"):
        put = device
    else:
        dev = device or jax.devices()[0]
        put = lambda batch: jax.device_put(batch, dev)  # noqa: E731
    stop = object()
    failure = []

    def worker():
        try:
            for batch in it:
                q.put(put(batch))
        except BaseException as e:  # noqa: BLE001 — handed to the consumer
            failure.append(e)
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            if failure:
                raise failure[0]
            return
        yield item
