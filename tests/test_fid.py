"""True-FID harness tests (hermetic: random-conv tower + synthetic images);
the CLIP tower test is gated on local weights."""

import numpy as np
import pytest

from hdmoe_tpu.obs.fid import ClipImageFeatures, RandomConvFeatures, fid_evaluate


def _imgs(seed, n=64, res=32, bright=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 200, (n, res, res, 3)).astype(np.int32) + bright
    return np.clip(base, 0, 255).astype(np.uint8)


def test_random_conv_features_contract():
    f = RandomConvFeatures(dim=128, seed=0)
    out = f(_imgs(0, n=8))
    assert out.shape == (8, 128)
    np.testing.assert_array_equal(out, RandomConvFeatures(dim=128, seed=0)(_imgs(0, n=8)))
    assert np.isfinite(out).all()


def test_fid_same_distribution_near_zero_and_shift_detected():
    f = RandomConvFeatures(dim=64, seed=0)
    real_a = [_imgs(s, n=32) for s in range(8)]
    real_b = [_imgs(100 + s, n=32) for s in range(8)]
    shifted = [_imgs(200 + s, n=32, bright=55) for s in range(8)]

    def sampler_from(batches):
        pool = np.concatenate(batches)
        state = {"i": 0}

        def fn(k):
            out = pool[state["i"] : state["i"] + k]
            state["i"] += k
            return out

        return fn

    n = 8 * 32
    fid_same = fid_evaluate(sampler_from(real_b), iter(real_a), f, n=n, batch=32)
    fid_shift = fid_evaluate(sampler_from(shifted), iter(real_a), f, n=n, batch=32)
    assert fid_same >= 0
    assert fid_shift > 5 * max(fid_same, 1e-6), (fid_same, fid_shift)


def test_fid_streaming_never_exhausts_memory_contract():
    """The harness streams: a generator that counts batches confirms exactly
    ceil(n/batch) pulls per side and raises if the real side is short."""
    f = RandomConvFeatures(dim=32, seed=1)
    calls = {"gen": 0}

    def sample_fn(k):
        calls["gen"] += 1
        return _imgs(calls["gen"], n=k)

    def real_iter(total_batches):
        for s in range(total_batches):
            yield _imgs(1000 + s, n=16)

    fid = fid_evaluate(sample_fn, real_iter(8), f, n=64, batch=16)
    assert calls["gen"] == 4 and np.isfinite(fid)

    with pytest.raises(ValueError, match="exhausted"):
        fid_evaluate(sample_fn, real_iter(2), f, n=64, batch=16)


def test_fid_end_to_end_with_engine():
    """50k-harness shape check at tiny n: a real SamplerEngine (tiny model,
    2-step sampler) against the synthetic dataset, random-conv tower."""
    import jax

    from hdmoe_tpu.models import precond_init
    from hdmoe_tpu.serve import SamplerEngine
    from hdmoe_tpu.train.data import batch_iterator, make_dataset
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg()
    engine = SamplerEngine(cfg, precond_init(jax.random.PRNGKey(0), cfg), batch=4, num_steps=2)
    seeds = iter(range(10_000))

    def sample_fn(k):
        return engine.sample(["p"] * k, seed=next(seeds))

    ds = make_dataset("synthetic", resolution=64, seed=0)
    real = batch_iterator(ds, 4, seed=0)
    fid = fid_evaluate(sample_fn, real, RandomConvFeatures(dim=64), n=16, batch=4)
    assert np.isfinite(fid) and fid >= 0


def _clip_available():
    try:
        ClipImageFeatures().init()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _clip_available(), reason="CLIP vision weights not available")
def test_clip_fid_tower_contract():
    f = ClipImageFeatures().init()
    out = f(_imgs(0, n=4, res=64))
    assert out.ndim == 2 and out.shape[0] == 4 and np.isfinite(out).all()


def test_random_tower_fingerprint_is_version_pinned():
    """Golden pin (VERDICT r3 item 8): cross-round tower-FID numbers are
    comparable iff this fingerprint is unchanged. If this test fails you
    changed the hermetic tower — bump RANDOM_TOWER_VERSION in obs/fid.py
    and expect a discontinuity in every tower-FID series in artifacts/."""
    f = RandomConvFeatures()  # the default (dim=512, seed=0) tower of record
    assert f.fingerprint() == "rc1:6588bf6aa28f"
    assert f.version == "rc1"
