"""Debugging helpers + prenormalized-weight folding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.obs.debugging import assert_all_finite, checked
from hdmoe_tpu.ops import mp


def test_assert_all_finite_names_bad_leaves():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_all_finite(good)  # no raise
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, jnp.nan])}}
    with pytest.raises(FloatingPointError) as e:
        assert_all_finite(bad, name="params")
    assert "c" in str(e.value) and "1/2" in str(e.value)


def test_checked_catches_nan():
    def f(x):
        return jnp.log(x)  # NaN for negative input

    err, out = checked(f)(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()
    err2, out2 = checked(f)(jnp.asarray(1.0))
    err2.throw()  # clean


def test_prenormalized_weights_fold_equivalence():
    """Folding (project weights once, skip normalize-at-use) must match the
    default normalize-at-use path."""
    from hdmoe_tpu.train.optim import project_mp_weights

    params = mp.mp_conv_init(jax.random.PRNGKey(0), 16, 8, (3, 3))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    ref = mp.mp_conv_apply(params, x, gain=1.5)
    folded = project_mp_weights({"layer": params})["layer"]
    with mp.prenormalized_weights():
        fn = jax.jit(lambda p, x_: mp.mp_conv_apply(p, x_, gain=1.5)).lower(folded, x).compile()
    got = fn(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_prenormalized_context_restores():
    assert not mp._WEIGHTS_PRENORMALIZED.get()
    with mp.prenormalized_weights():
        assert mp._WEIGHTS_PRENORMALIZED.get()
    assert not mp._WEIGHTS_PRENORMALIZED.get()


def test_trace_time_switches_are_context_local():
    """Concurrent traces must not leak conv-impl/prenorm state (ContextVar,
    not module global): a context set in one thread is invisible in another."""
    import threading

    seen = {}

    def other_thread():
        seen["conv"] = mp._CONV_IMPL.get()
        seen["prenorm"] = mp._WEIGHTS_PRENORMALIZED.get()

    with mp.conv_layout("pallas"), mp.prenormalized_weights():
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
    assert seen == {"conv": "xla", "prenorm": False}
