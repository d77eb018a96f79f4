"""Weight-only int8 quantization: roundtrip bounds, engine integration,
and the ~4x deployment-artifact size reduction.

Capability extension beyond the reference (no quantization anywhere in
/root/reference); see hdmoe_tpu/ops/quant.py.
"""

import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hdmoe_tpu.models import precond_init
from hdmoe_tpu.ops.quant import (
    dequantize_tree,
    quantization_error,
    quantize_tree_int8,
    tree_bytes,
)
from hdmoe_tpu.serve import SamplerEngine
from tests.test_model import tiny_cfg

KEY = jax.random.PRNGKey(0)


def _tiny_params():
    return precond_init(KEY, tiny_cfg())


def test_roundtrip_error_bound():
    """Symmetric per-channel int8: roundtrip error <= (channel max)/254 per
    element, i.e. <= half a quantization step."""
    params = _tiny_params()
    max_err, mean_err = quantization_error(params)
    assert 0 < max_err <= 1.0 / 254 + 1e-6, max_err
    assert mean_err <= max_err


def test_scale_is_per_output_channel():
    """The scale axis is the OUTPUT channel (axis 0 of the torch-ordered
    (out, in, kh, kw) mpw, matching the per-output-channel MP
    normalization). Regression test for the round-3 review find: reducing
    over all-but-LAST axis instead gave per-kernel-column scales, so a
    small-magnitude output channel inherited a large channel's scale and
    its relative error exploded."""
    from hdmoe_tpu.ops.quant import _quantize_leaf, _dequantize_leaf

    k = jax.random.PRNGKey(1)
    w = jax.random.normal(k, (4, 8, 3, 3))
    w = w.at[0].multiply(100.0)  # one dominant output channel
    q = _quantize_leaf(w)
    assert q["q8_scale"].shape == (4, 1, 1, 1)
    rt = _dequantize_leaf(q)
    for c in range(4):
        cmax = float(jnp.max(jnp.abs(w[c])))
        err = float(jnp.max(jnp.abs(rt[c] - w[c]))) / cmax
        # per-channel bound: half a quant step of THAT channel's max
        assert err <= 1.0 / 254 + 1e-6, (c, err)
    # linear weights (out, in): one scale per out row
    wl = jax.random.normal(k, (6, 5))
    assert _quantize_leaf(wl)["q8_scale"].shape == (6, 1)


def test_quantize_dequantize_topology_and_values():
    params = _tiny_params()
    q = quantize_tree_int8(params)
    rt = dequantize_tree(q)
    # same pytree topology as the source
    assert jax.tree_util.tree_structure(rt) == jax.tree_util.tree_structure(params)

    # every mpw leaf is int8-carried and close; every other leaf bit-equal
    def walk(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                walk(a[k], b[k], f"{path}/{k}")
        elif isinstance(a, (list, tuple)):
            for i, (x, y) in enumerate(zip(a, b)):
                walk(x, y, f"{path}[{i}]")
        else:
            if path.endswith("/mpw"):
                amax = float(jnp.max(jnp.abs(a))) or 1.0
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           atol=amax / 127.0, err_msg=path)
            else:
                np.testing.assert_array_equal(np.asarray(b), np.asarray(a), err_msg=path)

    walk(params, rt)


def test_double_quantize_raises_and_fp_passthrough():
    params = _tiny_params()
    q = quantize_tree_int8(params)
    with pytest.raises(ValueError, match="already"):
        quantize_tree_int8(q)
    # dequantize of a plain fp tree is the identity
    rt = dequantize_tree(params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_size_reduction():
    params = _tiny_params()
    q = quantize_tree_int8(params)
    fp, qb = tree_bytes(params), tree_bytes(q)
    # mpw dominates the tiny config too; expect >= 2.5x overall reduction
    assert qb < fp / 2.5, (fp, qb)


def test_engine_int8_close_to_fp32():
    """quantize="int8" compiles through the same AOT path; images stay close
    to the fp32 engine's (identical seeds/noise; only weights perturbed by
    <= 1/254 of each channel's max)."""
    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    e_fp = SamplerEngine(cfg, params, batch=2, num_steps=2)
    e_q8 = SamplerEngine(cfg, params, batch=2, num_steps=2, quantize="int8")
    assert e_q8.quantize == "int8"
    a = e_fp.sample(["a flower"], seed=5).astype(np.int32)
    b = e_q8.sample(["a flower"], seed=5).astype(np.int32)
    assert a.shape == b.shape
    # random-init tiny model, uint8 pixels: demand close-not-identical
    assert np.abs(a - b).mean() < 8.0, np.abs(a - b).mean()
    with pytest.raises(ValueError, match="quantize"):
        SamplerEngine(cfg, params, batch=2, num_steps=2, quantize="int4")


def test_export_int8_artifact_smaller_and_faithful(tmp_path):
    """The int8 engine exports (int8 leaves baked as constants), reloads
    without model code, reproduces the live engine within re-fusion
    tolerance, and the artifact shrinks vs the fp32 export of the same
    checkpoint.

    Unlike the fp32 artifact (bit-identical, test_deploy.py), baking int8
    constants lets XLA constant-fold the dequant multiply and re-fuse
    around it, which can flip isolated uint8 pixels sitting on a rounding
    knife edge (measured: 2/12288 pixels off on a random-init tiny model).
    The pinned contract: >= 99.9% of pixels bit-equal, tiny mean drift."""
    from hdmoe_tpu.deploy import export_sampler, load_sampler

    cfg = tiny_cfg()
    params = precond_init(KEY, cfg)
    e_fp = SamplerEngine(cfg, params, batch=2, num_steps=2)
    e_q8 = SamplerEngine(cfg, params, batch=2, num_steps=2, quantize="int8")
    p_fp = str(tmp_path / "fp32.hdmoe")
    p_q8 = str(tmp_path / "int8.hdmoe")
    export_sampler(e_fp, p_fp)
    meta = export_sampler(e_q8, p_q8)
    assert meta["quantize"] == "int8"
    # the zip stores the StableHLO blob uncompressed-size dominated by the
    # baked weights; compare the uncompressed payload sizes
    def payload(p):
        with zipfile.ZipFile(p) as z:
            return z.getinfo("sampler.bin").file_size

    assert payload(p_q8) < payload(p_fp), (payload(p_q8), payload(p_fp))
    sampler = load_sampler(p_q8)
    a = sampler.sample(["a rose"], seed=9).astype(np.int32)
    b = e_q8.sample(["a rose"], seed=9).astype(np.int32)
    assert a.shape == b.shape
    frac_diff = float((a != b).mean())
    assert frac_diff <= 1e-3, frac_diff
    assert float(np.abs(a - b).mean()) < 0.5
