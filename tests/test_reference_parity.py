"""Numerical parity against the actual reference implementation.

These tests import the PyTorch reference from /root/reference (read-only),
copy its randomly-initialized weights into our parameter layout, and assert
that forward outputs agree to float tolerance. This is the strongest form of
parity evidence: same weights, same inputs, same numbers — across frameworks
and layouts (NCHW torch vs NHWC JAX).

Covered: normalize / mp_silu / mp_sum / mp_cat / resample / MP_Fourier /
MP_Conv (linear + conv, odd + even kernels) / MP_Attention (self + cross) /
Unet_block / full Unet_expert / Router / EDM preconditioning coefficients.

Skipped wholesale when /root/reference is not present.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference repo unavailable", allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, str(REF))

import jax
import jax.numpy as jnp

import models.model_internals as ref_internals  # noqa: E402  (reference)
import models.model_components as ref_components  # noqa: E402  (reference)

from hdmoe_tpu.ops import mp  # noqa: E402
from hdmoe_tpu.ops.attention import mp_attention_apply  # noqa: E402
from hdmoe_tpu.models import components as comp  # noqa: E402

torch.manual_seed(0)
RTOL, ATOL = 2e-4, 2e-4


def t2n(x):
    return x.detach().cpu().numpy()


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def test_normalize_parity():
    x = torch.randn(4, 16, 8, 8)
    ref = t2n(ref_internals.normalize(x))
    got = np.asarray(mp.normalize(jnp.asarray(t2n(x))))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)
    # channel-dim pixel norm (dim=[1] NCHW == axis=-1 NHWC)
    ref2 = t2n(ref_internals.normalize(x, dim=[1]))
    got2 = np.asarray(mp.normalize(jnp.asarray(nchw_to_nhwc(t2n(x))), axis=[-1]))
    np.testing.assert_allclose(nhwc_to_nchw(got2), ref2, rtol=RTOL, atol=ATOL)


def test_mp_silu_sum_cat_parity():
    a = torch.randn(64, 32)
    b = torch.randn(64, 32)
    np.testing.assert_allclose(
        np.asarray(mp.mp_silu(jnp.asarray(t2n(a)))), t2n(ref_internals.mp_silu(a)), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(mp.mp_sum(jnp.asarray(t2n(a)), jnp.asarray(t2n(b)), 0.3)),
        t2n(ref_internals.mp_sum(a, b, 0.3)),
        rtol=RTOL, atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(mp.mp_cat(jnp.asarray(t2n(a)), jnp.asarray(t2n(b)), axis=1, t=0.7)),
        t2n(ref_internals.mp_cat(a, b, dim=1, t=0.7)),
        rtol=RTOL, atol=ATOL,
    )


def test_resample_parity():
    x = torch.randn(2, 5, 8, 8)
    for mode in ("keep", "down", "up"):
        ref = t2n(ref_internals.resample(x, mode=mode))
        got = np.asarray(mp.resample(jnp.asarray(nchw_to_nhwc(t2n(x))), mode))
        np.testing.assert_allclose(nhwc_to_nchw(got), ref, rtol=RTOL, atol=ATOL)


def test_mp_fourier_parity():
    ref_mod = ref_internals.MP_Fourier(num_channels=32, bandwidth=1.5)
    params = {
        "freqs": jnp.asarray(t2n(ref_mod.freqs)),
        "phases": jnp.asarray(t2n(ref_mod.phases)),
    }
    x = torch.randn(16)
    np.testing.assert_allclose(
        np.asarray(mp.mp_fourier_apply(params, jnp.asarray(t2n(x)))),
        t2n(ref_mod(x)),
        rtol=RTOL, atol=ATOL,
    )


@pytest.mark.parametrize("kernel", [(), (3, 3), (4, 4), (5, 5)])
def test_mp_conv_parity(kernel):
    ref_mod = ref_internals.MP_Conv(in_channels=6, out_channels=10, kernel=kernel).eval()
    params = {"mpw": jnp.asarray(t2n(ref_mod.weights))}
    if kernel == ():
        x = torch.randn(8, 6)
        ref = t2n(ref_mod(x, gain=1.3))
        got = np.asarray(mp.mp_conv_apply(params, jnp.asarray(t2n(x)), gain=1.3))
    else:
        x = torch.randn(2, 6, 9, 11)
        ref = t2n(ref_mod(x, gain=1.3))
        got = nhwc_to_nchw(
            np.asarray(mp.mp_conv_apply(params, jnp.asarray(nchw_to_nhwc(t2n(x))), gain=1.3))
        )
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def _attn_params(ref_mod):
    p = {
        "q_proj": {"mpw": jnp.asarray(t2n(ref_mod.q_proj.weights).squeeze(-1).squeeze(-1))},
        "k_proj": {"mpw": jnp.asarray(t2n(ref_mod.k_proj.weights).squeeze(-1).squeeze(-1))},
        "v_proj": {"mpw": jnp.asarray(t2n(ref_mod.v_proj.weights).squeeze(-1).squeeze(-1))},
        "out_proj": {"mpw": jnp.asarray(t2n(ref_mod.out_proj.weights).squeeze(-1).squeeze(-1))},
    }
    if ref_mod.rel_pos_bias is not None:
        p["rel_pos_bias"] = jnp.asarray(t2n(ref_mod.rel_pos_bias))
    for name in ("q_time", "k_time", "v_time"):
        sub = getattr(ref_mod, name)
        if sub is not None:
            p[name] = {"mpw": jnp.asarray(t2n(sub.weights).squeeze(-1).squeeze(-1))}
    return p


def test_mp_attention_self_parity():
    ref_mod = ref_internals.MP_Attention(num_heads=4, emb_dim=32, seq_ln=24, time_dim=16).eval()
    with torch.no_grad():
        ref_mod.rel_pos_bias.copy_(torch.randn_like(ref_mod.rel_pos_bias) * 0.1)
    q = torch.randn(2, 24, 32)
    t = torch.randn(2, 16)
    ref = t2n(ref_mod(q, gain_s=1.0, gain_t=0.7, time_embedding=t))
    got = np.asarray(
        mp_attention_apply(
            _attn_params(ref_mod), jnp.asarray(t2n(q)), gain_s=1.0, gain_t=0.7,
            time_embedding=jnp.asarray(t2n(t)), num_heads=4, attn_balance=0.5,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_mp_attention_cross_parity():
    ref_mod = ref_internals.MP_Attention(
        num_heads=4, emb_dim=32, seq_ln=24, context_dim=48, is_cross_attn=True
    ).eval()
    q = torch.randn(2, 24, 32)
    ctx = torch.randn(2, 7, 48)
    ref = t2n(ref_mod(q, gain_s=1.0, gain_t=1.0, context=ctx))
    got = np.asarray(
        mp_attention_apply(
            _attn_params(ref_mod), jnp.asarray(t2n(q)), context=jnp.asarray(t2n(ctx)),
            num_heads=4, attn_balance=0.5, is_cross_attn=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Blocks / experts / router
# ---------------------------------------------------------------------------


def _conv_params(ref_conv):
    return {"mpw": jnp.asarray(t2n(ref_conv.weights))}


def _unet_block_params(ref_blk):
    p = {
        "emb_layer": _conv_params(ref_blk.emb_layer),
        "conv_res1": _conv_params(ref_blk.conv_res1),
        "conv_res2": _conv_params(ref_blk.conv_res2),
    }
    if ref_blk.conv_skip is not None:
        p["conv_skip"] = _conv_params(ref_blk.conv_skip)
    return p


@pytest.mark.parametrize("block_type,resample_mode", [("enc", "keep"), ("enc", "down"), ("dec", "keep"), ("dec", "up")])
def test_unet_block_parity(block_type, resample_mode):
    ref_blk = ref_components.Unet_block(
        in_channels=8, out_channels=12, kernel=(3, 3), emb_size=16,
        resample=resample_mode, Type=block_type,
    ).eval()
    cfg = comp.UnetBlockCfg(
        in_channels=8, out_channels=12, kernel=(3, 3), emb_size=16,
        resample=resample_mode, block_type=block_type,
    )
    x = torch.randn(2, 8, 8, 8)
    emb = torch.randn(2, 16)
    ref = t2n(ref_blk(x, emb))
    got = nhwc_to_nchw(
        np.asarray(
            comp.unet_block_apply(
                _unet_block_params(ref_blk), cfg, jnp.asarray(nchw_to_nhwc(t2n(x))), jnp.asarray(t2n(emb))
            )
        )
    )
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_unet_expert_parity():
    """Full U-Net expert forward, reference weights ported into our layout."""
    kw = dict(
        img_resolution=16, img_channels=8, time_emb_dim=16, text_emb_dim=12,
        channel_mult=[1, 2], model_channels=8, channel_mult_emb=2, num_blocks=1,
        kernel_size=(3, 3),
    )
    ref_mod = ref_components.Unet_expert(**kw).eval()
    with torch.no_grad():
        ref_mod.out_gain.copy_(torch.tensor(1.7))  # nonzero so outputs are informative

    cfg = comp.UnetExpertCfg(
        img_resolution=16, img_channels=8, time_emb_dim=16, text_emb_dim=12,
        channel_mult=(1, 2), model_channels=8, channel_mult_emb=2, num_blocks=1,
        kernel_size=(3, 3),
    )
    enc, dec, _ = comp.unet_expert_plan(cfg)
    params = {
        "out_gain": jnp.asarray(t2n(ref_mod.out_gain)),
        "map_noise": _conv_params(ref_mod.map_noise),
        "map_text": _conv_params(ref_mod.map_text),
        "out_conv": _conv_params(ref_mod.out_conv),
        "encoders": {},
        "decoders": {},
    }
    for name, kind, _spec in enc:
        ref_sub = ref_mod.encoders[name]
        params["encoders"][name] = (
            _conv_params(ref_sub) if kind == "conv" else _unet_block_params(ref_sub)
        )
    for name, _kind, _spec in dec:
        params["decoders"][name] = _unet_block_params(ref_mod.decoders[name])

    x = torch.randn(2, 8, 16, 16)
    t = torch.randn(2, 16)
    txt = torch.randn(2, 7, 12)
    ref = t2n(ref_mod(x, t, txt))
    got = nhwc_to_nchw(
        np.asarray(
            comp.unet_expert_apply(
                params, cfg, jnp.asarray(nchw_to_nhwc(t2n(x))), jnp.asarray(t2n(t)), jnp.asarray(t2n(txt))
            )
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_router_parity():
    ref_mod = ref_components.Router(in_channels=4, time_dim=16, top_k=2, num_experts=5).eval()
    params = {
        "conv1": _conv_params(ref_mod.hard_route[0]),
        "gn1": {
            "scale": jnp.asarray(t2n(ref_mod.hard_route[1].weight)),
            "bias": jnp.asarray(t2n(ref_mod.hard_route[1].bias)),
        },
        "conv2": _conv_params(ref_mod.hard_route[3]),
        "gn2": {
            "scale": jnp.asarray(t2n(ref_mod.hard_route[4].weight)),
            "bias": jnp.asarray(t2n(ref_mod.hard_route[4].bias)),
        },
        "conv3": _conv_params(ref_mod.hard_route[6]),
        "gn3": {
            "scale": jnp.asarray(t2n(ref_mod.hard_route[7].weight)),
            "bias": jnp.asarray(t2n(ref_mod.hard_route[7].bias)),
        },
        "time_linear": _conv_params(ref_mod.time_linear),
        "linear": _conv_params(ref_mod.linear),
    }
    x = torch.randn(3, 4, 8, 8)
    t = torch.randn(3, 16)
    mask = torch.ones(3, 5)
    mask[:, 1] = 0.0
    ref_sparse, ref_probs, ref_raw = ref_mod(x, t, mask=mask, zeta=0.0)
    got_sparse, got_probs, got_raw = comp.router_apply(
        params, jnp.asarray(nchw_to_nhwc(t2n(x))), jnp.asarray(t2n(t)),
        mask=jnp.asarray(t2n(mask)), top_k=2,
    )
    # raw logits contain -inf at masked entries; compare finite entries
    finite = np.isfinite(t2n(ref_raw))
    np.testing.assert_allclose(np.asarray(got_raw)[finite], t2n(ref_raw)[finite], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_probs), t2n(ref_probs), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_sparse), t2n(ref_sparse), rtol=5e-4, atol=5e-4)


def test_precond_coefficient_parity():
    """EDM c_in/c_out/c_skip/c_noise exactly as the reference computes them
    (model_config2.py:431-435), incl. the non-canonical skip-on-scaled-input."""
    sigma = np.exp(np.random.RandomState(0).randn(5, 1, 1, 1)).astype(np.float32)
    sd = 0.5
    ref_c_skip = sd**2 / (sigma**2 + sd**2)
    ref_c_out = sigma * sd / np.sqrt(sigma**2 + sd**2)
    ref_c_in = 1.0 / np.sqrt(sd**2 + sigma**2)
    ref_c_noise = np.log(sigma.reshape(-1)) / 4.0

    s = jnp.asarray(sigma)
    c_skip = sd**2 / (s**2 + sd**2)
    c_out = s * sd / jnp.sqrt(s**2 + sd**2)
    c_in = 1.0 / jnp.sqrt(sd**2 + s**2)
    c_noise = jnp.log(s.reshape(-1)) / 4.0
    np.testing.assert_allclose(np.asarray(c_skip), ref_c_skip, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), ref_c_out, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_in), ref_c_in, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_noise), ref_c_noise, rtol=1e-6)
