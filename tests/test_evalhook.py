"""In-training evaluation hook (train/evalhook.py + serve.update_params).

The reference only samples after training (Utils/training.py:273-341);
this hook is new capability, so the oracles are internal: the swapped-in
weights must actually drive the compiled sampler (different params =>
different images through the SAME executable), and the train-loop wiring
must produce the eval JSONL stream + grid PNGs.
"""

import json
import os

import jax
import numpy as np
import pytest

from hdmoe_tpu.models import precond_init
from hdmoe_tpu.serve import SamplerEngine

from tests.test_model import tiny_cfg

KEY = jax.random.PRNGKey(0)


def test_update_params_swaps_weights_no_recompile():
    cfg = tiny_cfg()
    p1 = precond_init(KEY, cfg)
    eng = SamplerEngine(cfg, p1, batch=2, num_steps=2)
    aot = eng._sample_aot  # the compiled executable must survive the swap
    img1 = eng.sample(["a", "b"], seed=0)

    p2 = precond_init(jax.random.PRNGKey(9), cfg)
    eng.update_params(p2)
    assert eng._sample_aot is aot
    img2 = eng.sample(["a", "b"], seed=0)
    assert img1.shape == img2.shape
    assert not np.array_equal(img1, img2)  # new weights drive the program

    # swapping the original weights back restores the original images
    eng.update_params(p1)
    img1b = eng.sample(["a", "b"], seed=0)
    np.testing.assert_array_equal(img1, img1b)


def test_evaluator_scores_and_writes_grid(tmp_path):
    from hdmoe_tpu.obs.logger import Logger
    from hdmoe_tpu.train.data import SyntheticDataset
    from hdmoe_tpu.train.evalhook import TrainEvaluator

    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    logger = Logger(log_dir=str(tmp_path), run_name="ev")
    ev = TrainEvaluator(cfg, SyntheticDataset(resolution=8, size=32),
                        str(tmp_path / "grids"), n=4, batch=2, num_steps=2,
                        logger=logger)
    rec = ev(params, step=10)
    assert np.isfinite(rec["fid"]) and rec["n"] == 4
    assert rec["tower"] == "random-conv"
    assert os.path.exists(tmp_path / "grids" / "eval_step10.png")

    # second eval point reuses the SAME engine/executable
    eng = ev._engine
    rec2 = ev(jax.tree_util.tree_map(lambda x: x * 1.01, params), step=20)
    assert ev._engine is eng
    assert np.isfinite(rec2["fid"])

    lines = [json.loads(l) for l in open(logger.eval_log_file)]
    assert [l["step"] for l in lines] == [10, 20]
    assert all("fid" in l and l["tower"] == "random-conv" for l in lines)


def test_train_loop_eval_interval_wiring(tmp_path):
    from __graft_entry__ import _flagship
    from hdmoe_tpu.train.configs import zeta_configs
    from hdmoe_tpu.train.loss import EDMLossConfig
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    mask_cfg = dict(
        unet_attr=[3.0, 5.0], vit_attr=[2.0, 4.0], p_mean=-1.2, p_std=1.6,
        BW=0.4, max_BW=0.8, min_active=1, step_size=64, strat_band=0.25,
        unet_noise_range=[0.0, 0.6], vit_noise_range=[0.4, 1.0],
    )
    cfg, _ = _flagship(tiny=True)
    run = RunConfig(save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
                    run_name="ev_smoke", batch_size=2, total_steps=3,
                    save_interval=0, log_interval=1, data_img_res=64,
                    dataset="synthetic", print_interval=10,
                    eval_interval=2, eval_n=2, eval_num_steps=2)
    out = training_hdmoe(cfg, OptimConfig(total_schedule_steps=3),
                         EDMLossConfig(num_experts=2), mask_cfg, zeta_configs, run)
    assert np.isfinite(out["loss"])
    stream = tmp_path / "logs" / "ev_smoke_eval.jsonl"
    lines = [json.loads(l) for l in open(stream)]
    assert len(lines) == 1 and lines[0]["step"] == 2  # gate fires at step 2
    assert lines[0]["ema"] is False  # no EMA tracked in this run
    grids = list((tmp_path / "logs" / "ev_smoke_eval").glob("*.png"))
    assert len(grids) == 1
