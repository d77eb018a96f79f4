"""Device mesh construction for SPMD training.

No reference analog (the reference is single-device, SURVEY.md §2.7); this is
the TPU-native communication layer: a ``jax.sharding.Mesh`` over which pjit
partitions the train step, with XLA inserting the collectives (psum for DP
grad reduction, all-gathers for TP) over ICI.

Axes:
- ``data``   : batch (data parallel; gradients psum over this axis)
- ``model``  : tensor parallel (MP conv/linear output channels sharded)
- ``expert`` : expert parallel (stacked homogeneous expert banks sharded on
               their leading expert axis; see models/moe_stacked.py)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1
    expert: int = 1

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.data, self.model, self.expert)


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model, expert) mesh.

    With no config, all devices go to the data axis. Axis sizes must multiply
    to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(data=n)
    assert cfg.data * cfg.model * cfg.expert == n, (
        f"mesh {cfg.shape} does not cover {n} devices"
    )
    dev_array = np.asarray(devices).reshape(cfg.shape)
    return Mesh(dev_array, axis_names=("data", "model", "expert"))
