"""Loss / sigma-sampler / scheduler tests.

Mirrors reference oracles: balanced-routing load-balance == 1.0 exactly
(test_loss_1.py:76-91), median-sigma center-expert activation and
attribute-rank mapping (test_mask_generator.py:30-82), zeta warmup/decay.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from hdmoe_tpu.train import (
    EDMLossConfig,
    edm_loss,
    load_balance,
    z_loss,
    path_prior_loss,
    sample_sigma,
    sample_sigma_hybrid,
    ZetaSchedule,
    MaskGenerator,
)

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# Sigma samplers
# ---------------------------------------------------------------------------


def test_sample_sigma_shapes_and_range():
    s = sample_sigma(KEY, 64)
    assert s.shape == (64, 1, 1, 1)
    assert (s >= 0.002).all() and (s <= 80.0).all()
    su = sample_sigma(KEY, 64, uniform=True)
    assert (su >= 0.002 - 1e-6).all() and (su <= 80.0 + 1e-4).all()


def test_sample_sigma_hybrid_mix():
    s = sample_sigma_hybrid(KEY, 1000, extreme_prob=0.5, p_mean=-1.2, p_std=1.6)
    assert s.shape == (1000, 1, 1, 1)
    assert (s >= 0.002).all() and (s <= 80.0).all()
    # hybrid should reach sigma regions log-normal alone essentially never hits
    assert float(s.max()) > 20.0
    # and not be sorted (shuffled)
    flat = np.asarray(s).reshape(-1)
    assert not (np.diff(flat) >= 0).all()


# ---------------------------------------------------------------------------
# Loss terms
# ---------------------------------------------------------------------------


def test_load_balance_uniform_is_one():
    probs = jnp.full((16, 4), 0.25)
    np.testing.assert_allclose(float(load_balance(probs, 4)), 1.0, rtol=1e-6)


def test_load_balance_collapse_is_num_experts():
    probs = jax.nn.one_hot(jnp.zeros(16, dtype=jnp.int32), 4)
    np.testing.assert_allclose(float(load_balance(probs, 4)), 4.0, rtol=1e-6)


def test_z_loss_zero_logits():
    logits = jnp.zeros((8, 4))
    np.testing.assert_allclose(float(z_loss(logits)), math.log(4.0) ** 2, rtol=1e-5)


def test_path_prior_loss_zero_at_target():
    sigma = jnp.full((8, 1, 1, 1), 1.0)  # at transition: target = [0.5, 0.5]
    scaling = jnp.full((8, 2), 1.0)  # probs = [0.5, 0.5]
    assert abs(float(path_prior_loss(scaling, sigma))) < 1e-5


def _fake_out(b=8, e=4, with_logvar=True):
    return {
        "denoised": jnp.zeros((b, 8, 8, 3)),
        "Unet_router_loss": jnp.full((b, e), 1.0 / e),
        "vit_router_loss": jnp.full((b, e), 1.0 / e),
        "Unet_raw": jnp.zeros((b, e)),
        "vit_raw": jnp.zeros((b, e)),
        "scaling_net_out": jnp.full((b, 2), 1.0),
        "log_var": jnp.zeros((b, 1, 1, 1)) if with_logvar else None,
    }


def test_edm_loss_perfect_prediction():
    cfg = EDMLossConfig(num_experts=4, unet_bal=0.0, vit_bal=0.0, z_bal=0.0)
    x = jnp.zeros((8, 8, 8, 3))
    out = edm_loss(cfg, x, jnp.ones((8, 1, 1, 1)), _fake_out())
    # perfect prediction, logvar=0 -> pure = 0; total = 0
    np.testing.assert_allclose(float(out["loss"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(out["denoising"]), 0.0, atol=1e-7)
    # entropy is WIRED (fix-not-copy of the reference's hardwired 0.0,
    # utils.py:154): uniform 4-expert routing -> ln 4, matching the
    # router-stats stream's computation (obs/logger.py:94-96).
    np.testing.assert_allclose(float(out["entropy"]), math.log(4.0), rtol=1e-5)


def test_edm_loss_entropy_matches_router_stats_stream():
    """The training-stream entropy must equal the logger's usage entropy."""
    key = jax.random.PRNGKey(3)
    probs_u = jax.nn.softmax(jax.random.normal(key, (16, 4)), axis=-1)
    probs_v = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(4), (16, 4)), axis=-1)
    fo = _fake_out(b=16)
    fo["Unet_router_loss"] = probs_u
    fo["vit_router_loss"] = probs_v
    cfg = EDMLossConfig(num_experts=4)
    out = edm_loss(cfg, jnp.zeros((16, 8, 8, 3)), jnp.ones((16, 1, 1, 1)), fo)

    def stream_entropy(p):  # obs/logger.py:94-96
        usage = np.asarray(p).mean(axis=0)
        norm = usage / (usage.sum() + 1e-10)
        return float(-np.sum(norm * np.log(norm + 1e-10)))

    expected = 0.5 * (stream_entropy(probs_u) + stream_entropy(probs_v))
    np.testing.assert_allclose(float(out["entropy"]), expected, rtol=1e-5)


def test_edm_loss_uncertainty_weighting():
    cfg = EDMLossConfig(num_experts=4, unet_bal=0.0, vit_bal=0.0, z_bal=0.0)
    x = jnp.ones((4, 8, 8, 3))
    fo = _fake_out(b=4)
    fo["log_var"] = jnp.full((4, 1, 1, 1), 2.0)
    out = edm_loss(cfg, x, jnp.ones((4, 1, 1, 1)), fo)
    # sq_err = 1, logvar=2 -> pure = 1/e^2 + 2
    np.testing.assert_allclose(float(out["pure_loss"]), math.exp(-2.0) + 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(out["denoising"]), 1.0, rtol=1e-6)


def test_edm_loss_without_logvar():
    cfg = EDMLossConfig(num_experts=4, unet_bal=0.0, vit_bal=0.0, z_bal=0.0)
    x = jnp.ones((4, 8, 8, 3)) * 2.0
    out = edm_loss(cfg, x, jnp.ones((4, 1, 1, 1)), _fake_out(b=4, with_logvar=False))
    np.testing.assert_allclose(float(out["pure_loss"]), 4.0, rtol=1e-6)


def test_edm_loss_clamps():
    cfg = EDMLossConfig(num_experts=4)
    x = jnp.full((4, 8, 8, 3), 1e4)
    out = edm_loss(cfg, x, jnp.ones((4, 1, 1, 1)), _fake_out(b=4))
    assert float(out["loss"]) <= 50.0
    assert float(out["pure_loss"]) <= 50.0


def test_edm_loss_balanced_routing_balance_term():
    cfg = EDMLossConfig(num_experts=4, unet_bal=0.5, vit_bal=0.5, z_bal=0.0)
    x = jnp.zeros((8, 8, 8, 3))
    out = edm_loss(cfg, x, jnp.ones((8, 1, 1, 1)), _fake_out())
    # balanced probs -> load_balance == 1.0 each -> balance = 0.5 + 0.5
    np.testing.assert_allclose(float(out["balance"]), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# Zeta schedule
# ---------------------------------------------------------------------------


def test_zeta_warmup_and_decay_cos():
    z = ZetaSchedule(total_steps=1000, max_zeta=2.0, min_zeta=0.01, strategy="cos", warmup_ratio=0.1)
    assert z(0) == 2.0
    assert z(99) == 2.0  # warmup hold
    np.testing.assert_allclose(z(1000), 0.01, rtol=1e-5)
    np.testing.assert_allclose(z(5000), 0.01, rtol=1e-5)
    mid = z(550)  # midpoint of decay
    np.testing.assert_allclose(mid, 0.01 + (2.0 - 0.01) * 0.5, rtol=1e-2)
    # monotone non-increasing over decay
    vals = [z(s) for s in range(100, 1000, 50)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_zeta_exp_strategy_bounds():
    z = ZetaSchedule(total_steps=1000, max_zeta=2.0, min_zeta=0.01, strategy="exp", warmup_ratio=0.0)
    for s in (0, 10, 500, 999, 2000):
        v = z(s)
        assert 0.01 - 1e-9 <= v <= 2.0 + 1e-9


def test_zeta_traced_matches_host():
    z = ZetaSchedule(total_steps=1000, max_zeta=2.0, min_zeta=0.01, strategy="cos", warmup_ratio=0.05)
    f = jax.jit(lambda s: z(s))
    for s in (0, 49, 500, 999, 1500):
        np.testing.assert_allclose(float(f(jnp.asarray(s))), z(s), rtol=1e-6)


# ---------------------------------------------------------------------------
# Mask generator
# ---------------------------------------------------------------------------


def test_mask_centers_rank_mapping():
    gen = MaskGenerator(expert_attributes=(5.0, 3.0, 16.0, 3.0), noise_range=(0.0, 1.0))
    centers = gen.expert_centers
    # stable sort ranks: attrs sorted -> [3(idx1), 3(idx3), 5(idx0), 16(idx2)]
    np.testing.assert_allclose(centers, [2.0 / 3.0, 0.0, 1.0, 1.0 / 3.0], atol=1e-6)


def test_mask_median_sigma_activates_center():
    gen = MaskGenerator(
        expert_attributes=(3.0, 5.0, 7.0), p_mean=-1.2, p_std=1.6, bandwidth=0.2,
        min_active=1, total_steps=100, strat_band="none",
    )
    sigma = jnp.full((4, 1, 1, 1), math.exp(-1.2))  # percentile 0.5
    mask = gen(sigma, step=0)
    # center expert (attr 5 -> center 0.5) active; extremes inactive at bw=0.2
    np.testing.assert_array_equal(np.asarray(mask), np.tile([0.0, 1.0, 0.0], (4, 1)))


def test_mask_extreme_sigma_activates_extreme_expert():
    gen = MaskGenerator(
        expert_attributes=(3.0, 5.0, 7.0), p_mean=-1.2, p_std=1.6, bandwidth=0.1,
        min_active=1, total_steps=100, strat_band="none",
    )
    hi = gen(jnp.full((1, 1, 1, 1), 80.0), step=0)
    lo = gen(jnp.full((1, 1, 1, 1), 0.002), step=0)
    assert np.asarray(hi)[0, 2] == 1.0 and np.asarray(hi)[0, 0] == 0.0
    assert np.asarray(lo)[0, 0] == 1.0 and np.asarray(lo)[0, 2] == 0.0


def test_mask_min_active_safety():
    gen = MaskGenerator(
        expert_attributes=(3.0, 5.0, 7.0), bandwidth=1e-6, min_active=2,
        total_steps=100, strat_band="none",
    )
    mask = gen(jnp.full((5, 1, 1, 1), 1.0), step=0)
    assert (np.asarray(mask).sum(axis=1) >= 2).all()


def test_mask_bandwidth_widens():
    gen = MaskGenerator(
        expert_attributes=(3.0, 5.0), bandwidth=0.3, max_bandwidth=0.8,
        total_steps=1000, step_size=0.1, strat_band="step",
    )
    from hdmoe_tpu.train import bandwidth_at_step

    np.testing.assert_allclose(bandwidth_at_step(gen, 0), 0.3, rtol=1e-6)
    np.testing.assert_allclose(bandwidth_at_step(gen, 1000), 0.8, rtol=1e-6)
    assert bandwidth_at_step(gen, 500) > 0.3
    lin = MaskGenerator(
        expert_attributes=(3.0, 5.0), bandwidth=0.3, max_bandwidth=0.8,
        total_steps=1000, strat_band="linear",
    )
    np.testing.assert_allclose(bandwidth_at_step(lin, 500), 0.55, rtol=1e-6)


def test_mask_jittable():
    gen = MaskGenerator(expert_attributes=(3.0, 3.0, 5.0, 5.0), p_mean=-1.2, p_std=1.6)
    f = jax.jit(lambda s, step: gen(s, step))
    m = f(jnp.full((8, 1, 1, 1), 0.5), jnp.asarray(100))
    assert m.shape == (8, 4)
    assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}


def test_log_weight_statistics_device_reduction(tmp_path):
    """The weight-stats reduction runs on device and matches a direct numpy
    computation over the same leaves (>=2-D only), at the reference's
    50*log_interval cadence (graphs/logger.py:267-326)."""
    import json

    from hdmoe_tpu.obs.logger import Logger

    rng = np.random.default_rng(0)
    bank = {
        "w1": {"mpw": jnp.asarray(rng.normal(size=(4, 3, 3, 8)).astype(np.float32))},
        "w2": {"mpw": jnp.asarray(rng.normal(2.0, 0.5, size=(16, 8)).astype(np.float32))},
        "bias": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),  # 1-D: excluded
    }
    params = {"net": {"unet_experts": bank}}
    logger = Logger(log_dir=str(tmp_path), run_name="ws", log_interval=1)
    logger.log_weight_statistics(0, params)       # 0 % 50 == 0 -> logs
    logger.log_weight_statistics(7, params)       # 7 % 50 != 0 -> skipped
    rows = [json.loads(l) for l in open(tmp_path / "ws_weights.jsonl")]
    assert len(rows) == 1

    flat = np.concatenate([
        np.asarray(bank["w1"]["mpw"]).ravel(), np.asarray(bank["w2"]["mpw"]).ravel()])
    row = rows[0]
    np.testing.assert_allclose(row["Unet_experts_weight_mean"], flat.mean(), atol=2e-6)
    np.testing.assert_allclose(row["Unet_experts_weight_std"], flat.std(), atol=2e-5)
    np.testing.assert_allclose(row["Unet_experts_weight_max"], flat.max(), atol=1e-6)
    np.testing.assert_allclose(row["Unet_experts_weight_min"], flat.min(), atol=1e-6)
