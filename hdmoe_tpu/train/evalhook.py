"""In-training sample-quality evaluation.

The reference only samples AFTER training (Utils/training.py:273-341
``sample_and_save`` on the final checkpoint); quality regressions during a
long run are invisible until the end. This hook scores the live training
state every ``RunConfig.eval_interval`` steps:

- ONE small-batch AOT sampler is compiled lazily at the first eval point
  (serve.SamplerEngine); every later eval swaps the current (or EMA) weights
  into the same executable (``engine.update_params`` — params are a program
  input, so no recompile).
- ``eval_n`` images stream through the FID harness (obs/fid.fid_evaluate)
  against the training dataset's real stream, random-conv tower (labeled in
  the record — values are internally comparable across eval points, which is
  exactly what an in-training trend needs).
- Each eval point writes a grid PNG (``eval_step{N}.png``) and one JSONL
  record to the logger's eval stream: {step, fid, n, num_steps, solver,
  tower, ema, wall_s}.

Small ``eval_n`` (the 64-image default) keeps an eval point to a few sampler
batches — a trend probe, not a paper number; the 50k harness
(``python -m hdmoe_tpu fid``) remains the number of record.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import jax
import numpy as np


class TrainEvaluator:
    """Callable ``(params, step) -> record`` bound to one training run."""

    def __init__(
        self,
        model_cfg,
        dataset,
        out_dir: str,
        *,
        n: int = 64,
        batch: int = 16,
        num_steps: int = 18,
        solver: str = "heun",
        vae_kind: str = "fake",
        text_kind: str = "fake",
        prompt: str = "a photo of a flower",
        seed: int = 0,
        gather: bool = False,
        logger: Optional[Any] = None,
    ):
        self.model_cfg = model_cfg
        self.dataset = dataset
        self.out_dir = out_dir
        self.n = int(n)
        self.batch = min(int(batch), self.n)
        self.num_steps = num_steps
        self.solver = solver
        self.vae_kind = vae_kind
        self.text_kind = text_kind
        self.prompt = prompt
        self.seed = seed
        self.gather = gather  # mesh runs: pull params to host for the 1-device engine
        self.logger = logger
        self._engine = None
        self._features = None
        os.makedirs(out_dir, exist_ok=True)

    def _ensure(self, params):
        if self._engine is None:
            from hdmoe_tpu.obs.fid import RandomConvFeatures
            from hdmoe_tpu.serve import SamplerEngine

            self._engine = SamplerEngine(
                self.model_cfg, params, batch=self.batch,
                num_steps=self.num_steps, solver=self.solver,
                vae_kind=self.vae_kind, text_kind=self.text_kind,
            )
            self._features = RandomConvFeatures()
        return self._engine

    def __call__(self, params, step: int, *, ema: bool = False) -> dict:
        from hdmoe_tpu.obs.fid import fid_evaluate
        from hdmoe_tpu.sampler.generate import save_image_grid
        from hdmoe_tpu.train.data import batch_iterator

        t0 = time.time()
        if self.gather:
            params = jax.device_get(params)
        engine = self._ensure(params)
        engine.update_params(params)

        seeds = iter(range(1 << 62))
        grid_imgs: list = []

        def sample_fn(k: int) -> np.ndarray:
            imgs = engine.sample([self.prompt] * k, seed=self.seed + step + next(seeds))
            if not grid_imgs:
                grid_imgs.append(np.asarray(imgs))
            return imgs

        real = batch_iterator(self.dataset, self.batch, seed=self.seed + 1)
        fid = fid_evaluate(sample_fn, real, self._features, n=self.n, batch=self.batch)
        save_image_grid(grid_imgs[0], os.path.join(self.out_dir, f"eval_step{step}.png"))
        record = {
            "fid": round(float(fid), 4),
            "n": self.n,
            "num_steps": self.num_steps,
            "solver": self.solver,
            "tower": "random-conv",
            "ema": bool(ema),
            "wall_s": round(time.time() - t0, 2),
        }
        if self.logger is not None:
            self.logger.log_eval(step, record)
        return record
