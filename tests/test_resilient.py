"""Fault-injection tests for the resilient training supervisor."""

from dataclasses import dataclass

import pytest

from hdmoe_tpu.train.resilient import RestartBudgetExceeded, resilient_train


@dataclass
class FakeRun:
    resume: bool = False
    name: str = "x"


def test_recovers_from_transient_faults():
    calls = {"n": 0, "resume_flags": []}

    def flaky_train(run_cfg=None):
        calls["n"] += 1
        calls["resume_flags"].append(run_cfg.resume)
        if calls["n"] <= 2:
            raise RuntimeError(f"injected fault {calls['n']}")
        return {"loss": 0.1}

    out = resilient_train(flaky_train, run_cfg=FakeRun(), max_restarts=3)
    assert out == {"loss": 0.1}
    assert calls["n"] == 3
    # first attempt cold, retries resume
    assert calls["resume_flags"] == [False, True, True]


def test_budget_exceeded_raises():
    def always_fails(run_cfg=None):
        raise ValueError("persistent fault")

    seen = []
    with pytest.raises(RestartBudgetExceeded):
        resilient_train(
            always_fails, run_cfg=FakeRun(), max_restarts=2,
            on_failure=lambda attempt, e: seen.append(attempt),
        )
    assert seen == [1, 2, 3]  # budget 2 => third failure raises


def test_keyboard_interrupt_not_swallowed():
    def interrupted(run_cfg=None):
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        resilient_train(interrupted, run_cfg=FakeRun(), max_restarts=5)


def test_end_to_end_crash_resume(tmp_path):
    """Real pipeline: crash mid-training (fault injected via a poisoned
    dataset), supervisor resumes from the checkpoint and finishes."""
    import jax

    from hdmoe_tpu.models.configs import HDMOEMConfig
    from hdmoe_tpu.train import data as data_mod
    from hdmoe_tpu.train.configs import mask_configs, zeta_configs
    from hdmoe_tpu.train.loss import EDMLossConfig
    from hdmoe_tpu.train.optim import OptimConfig
    from hdmoe_tpu.train.train_loop import RunConfig, training_hdmoe

    model_cfg = HDMOEMConfig(
        in_channels=4, img_resolution=8, internal_channels=8, time_emb_dim=16,
        text_emb_dim=0, num_experts=2, vit_patch_sizes=(2, 4), vit_emb_size=16,
        vit_num_blocks=1, vit_num_groups=4, vit_num_heads=4, unet_num_blocks=1,
        unet_model_channels=8, unet_kernel_sizes=((3, 3), (5, 5)), log_var_channels=8,
    )
    mask = dict(mask_configs, unet_attr=[3, 5], vit_attr=[2, 4])
    run = RunConfig(
        save_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"), run_name="res",
        batch_size=2, total_steps=4, save_interval=1, log_interval=1,
        data_img_res=64, vae="fake", text_encoder="fake", print_interval=10,
    )

    # Poison the dataset factory: raise once partway through the first attempt.
    orig_make = data_mod.make_dataset
    state = {"raised": False, "serves": 0}

    class PoisonedDataset:
        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner)

        def get(self, idx):
            state["serves"] += 1
            if state["serves"] == 5 and not state["raised"]:
                state["raised"] = True
                raise RuntimeError("injected data fault")
            return self.inner.get(idx)

    data_mod.make_dataset_orig = orig_make
    try:
        data_mod.make_dataset = lambda *a, **k: PoisonedDataset(orig_make(*a, **k))
        import hdmoe_tpu.train.train_loop as tl

        tl.make_dataset = data_mod.make_dataset  # rebind the loop's import

        out = resilient_train(
            training_hdmoe, model_cfg, OptimConfig(total_schedule_steps=4),
            EDMLossConfig(num_experts=2), mask, zeta_configs,
            run_cfg=run, max_restarts=2,
        )
        assert "loss" in out
        assert state["raised"]  # the fault really fired
    finally:
        data_mod.make_dataset = orig_make
        import hdmoe_tpu.train.train_loop as tl

        tl.make_dataset = orig_make
