"""Checkpoint / resume via orbax, TPU-native.

The reference only saves (torch.save of {step, model_state_dict,
optimizer_state_dict, mse, config}, Utils/training.py:242-271) and can only
restore weights in the inference path; there is no training resume
(SURVEY.md §5). This subsystem adds the full contract: save
{params, opt_state, step, PRNG key, mse, config} and restore an exact
training state, with retention of the last N checkpoints.
"""

from __future__ import annotations

import json
from dataclasses import asdict, is_dataclass
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from hdmoe_tpu.train.train_step import TrainState


def _key_data(key: jax.Array):
    """Raw uint32 view of a PRNG key (handles both raw and typed keys)."""
    try:
        if jax.numpy.issubdtype(key.dtype, jax.dtypes.prng_key):
            return jax.random.key_data(key)
    except Exception:
        pass
    return key


def _jsonable(cfg: Any) -> Any:
    if is_dataclass(cfg):
        return asdict(cfg)
    if isinstance(cfg, dict):
        return {k: _jsonable(v) for k, v in cfg.items()}
    return cfg


class CheckpointManager:
    """Orbax-backed save/restore of the full train state.

    ``async_save=True`` overlaps the disk write with training: orbax's save
    blocks only on the device→host transfer (so donated buffers are safe to
    reuse immediately) and streams to disk in a background thread. The next
    ``save``/``restore``/``close`` synchronizes with any in-flight write, so
    at most one write is outstanding and reads never race a partial one.
    """

    def __init__(self, save_dir: str, max_to_keep: int = 3, async_save: bool = False):
        self.save_dir = Path(save_dir).absolute()
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.async_save = async_save
        self._mgr = ocp.CheckpointManager(
            self.save_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(
        self,
        state: TrainState,
        key: jax.Array,
        mse: float = float("nan"),
        configs: Optional[Dict[str, Any]] = None,
    ) -> None:
        step = int(state.step)
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(step),
            "rng_key": np.asarray(_key_data(key)),
            "mse": np.asarray(mse, dtype=np.float64),
        }
        self._mgr.wait_until_finished()  # at most one in-flight write
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if not self.async_save:
            self._mgr.wait_until_finished()
        if configs is not None:
            with open(self.save_dir / f"config_{step}.json", "w") as f:
                json.dump(_jsonable(configs), f, indent=2, default=str)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, abstract_state: TrainState, key_like: jax.Array, step: Optional[int] = None
    ) -> Tuple[TrainState, jax.Array, float]:
        """Restore a (state, rng_key, mse) triple.

        ``abstract_state`` provides the tree structure/shapes (e.g. a freshly
        initialized state). ``step=None`` restores the latest checkpoint.
        """
        self._mgr.wait_until_finished()  # never read a partial async write
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.save_dir}")
        template = {
            "params": abstract_state.params,
            "opt_state": abstract_state.opt_state,
            "step": np.asarray(0),
            "rng_key": np.asarray(_key_data(key_like)),
            "mse": np.asarray(0.0, dtype=np.float64),
        }
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        state = TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"], dtype=jax.numpy.int32),
        )
        return state, jax.numpy.asarray(restored["rng_key"]), float(restored["mse"])

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
