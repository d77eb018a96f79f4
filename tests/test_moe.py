"""MoE dispatch/combine tests.

The critical MoE invariants from the reference suite (test_routers.py:117-178):
masked experts receive exactly zero weight and exactly zero gradient; dispatch
modes agree with the reference semantics (weighted sum over routed experts).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hdmoe_tpu.models import moe

KEY = jax.random.PRNGKey(0)
B, H, W, C = 6, 4, 4, 3
E = 3


def _make_experts():
    # Simple parametric experts: x * w_i (+ time/text aware for signature)
    weights = [jnp.float32(i + 1.0) for i in range(E)]

    def make(i):
        def fn(x, t, txt, *, train=False, key=None):
            return x * weights[i]

        return fn

    return [make(i) for i in range(E)]


def test_dense_dispatch_matches_manual():
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    gate = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, E)), axis=-1)
    out = moe.moe_dispatch_dense(x, _make_experts(), gate, t, None)
    expected = sum(
        x * (i + 1.0) * gate[:, i][:, None, None, None] for i in range(E)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_capacity_dispatch_full_capacity_equals_dense():
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    # top-1 style sparse gate
    idx = jnp.array([0, 1, 2, 0, 1, 2])
    gate = jax.nn.one_hot(idx, E)
    dense = moe.moe_dispatch_dense(x, _make_experts(), gate, t, None)
    cap = moe.moe_dispatch_capacity(x, _make_experts(), gate, t, None, capacity=B)
    np.testing.assert_allclose(np.asarray(cap), np.asarray(dense), rtol=1e-5)


def test_capacity_dispatch_drops_overflow():
    x = jnp.ones((B, H, W, C))
    t = jnp.zeros((B, 4))
    gate = jax.nn.one_hot(jnp.zeros((B,), dtype=jnp.int32), E)  # all to expert 0
    out = moe.moe_dispatch_capacity(x, _make_experts(), gate, t, None, capacity=2)
    got = np.asarray(out)
    # first two samples processed (weight 1 * expert scale 1), rest dropped -> 0
    np.testing.assert_allclose(got[:2], np.ones((2, H, W, C)))
    np.testing.assert_allclose(got[2:], np.zeros((B - 2, H, W, C)))


def test_masked_expert_zero_gradient():
    """Experts with zero gate weight must receive exactly zero parameter grad
    (reference test_routers.py:146-178)."""
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    gate = jnp.stack([jnp.ones(B), jnp.zeros(B), jnp.zeros(B)], axis=1)  # only expert 0

    def loss(expert_scales):
        fns = [
            (lambda s: (lambda xx, tt, txt, *, train=False, key=None: xx * s))(s)
            for s in expert_scales
        ]
        out = moe.moe_dispatch_dense(x, fns, gate, t, None)
        return jnp.sum(out**2)

    g = jax.grad(loss)(jnp.array([1.0, 2.0, 3.0]))
    assert float(g[0]) != 0.0
    assert float(g[1]) == 0.0
    assert float(g[2]) == 0.0


def test_text_mean_pooling():
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    gate = jnp.ones((B, 1))
    seen = {}

    def fn(xx, tt, txt, *, train=False, key=None):
        seen["txt_ndim"] = txt.ndim
        return xx

    txt3 = jax.random.normal(jax.random.PRNGKey(2), (B, 7, 5))
    moe.moe_dispatch_dense(x, [fn], gate, t, txt3)
    assert seen["txt_ndim"] == 2  # mean-pooled over sequence


def test_dispatch_jits():
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    gate = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (B, E)))
    f = jax.jit(
        lambda x_, g_: moe.moe_dispatch(x_, _make_experts(), g_, t, None, mode="capacity", capacity=4)
    )
    out = f(x, gate)
    assert out.shape == x.shape


def test_pallas_dispatch_matches_capacity_values_and_grads():
    """dispatch="pallas" (kernel-backed token movement) must equal the
    capacity path in values AND parameter gradients (custom_vjp adjoint)."""
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    idx = jnp.array([0, 1, 2, 0, 1, 2])
    gate = jax.nn.one_hot(idx, E)

    def run(mode, scales):
        fns = [
            (lambda s: (lambda xx, tt, txt, *, train=False, key=None: xx * s))(s)
            for s in scales
        ]
        return moe.moe_dispatch(x, fns, gate, t, None, mode=mode, capacity=B, top_k=1)

    scales = jnp.array([1.0, 2.0, 3.0])
    out_cap = run("capacity", scales)
    out_pal = run("pallas", scales)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_cap), rtol=1e-6)

    g_cap = jax.grad(lambda s: jnp.sum(run("capacity", s) ** 2))(scales)
    g_pal = jax.grad(lambda s: jnp.sum(run("pallas", s) ** 2))(scales)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_cap), rtol=1e-5)


def test_pallas_masked_expert_zero_gradient():
    """Zero-gate experts get exactly-zero grads through the Pallas path."""
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    gate = jnp.stack([jnp.ones(B), jnp.zeros(B), jnp.zeros(B)], axis=1)

    def loss(expert_scales):
        fns = [
            (lambda s: (lambda xx, tt, txt, *, train=False, key=None: xx * s))(s)
            for s in expert_scales
        ]
        out = moe.moe_dispatch(x, fns, gate, t, None, mode="pallas", capacity=B, top_k=1)
        return jnp.sum(out**2)

    g = jax.grad(loss)(jnp.array([1.0, 2.0, 3.0]))
    assert float(g[0]) != 0.0
    assert float(g[1]) == 0.0
    assert float(g[2]) == 0.0


def test_pallas_dispatch_top2_matches_dense():
    """top_k=2 sparse gate: the gather-based combine handles two contributions
    per sample without scatter races; values match the dense oracle."""
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    k1 = jnp.array([0, 1, 2, 0, 1, 2])
    k2 = jnp.array([1, 2, 0, 2, 0, 1])
    gate = jax.nn.one_hot(k1, E) * 0.7 + jax.nn.one_hot(k2, E) * 0.3
    dense = moe.moe_dispatch_dense(x, _make_experts(), gate, t, None)
    pal = moe.moe_dispatch(x, _make_experts(), gate, t, None, mode="pallas", capacity=B, top_k=2)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(dense), rtol=1e-5, atol=1e-6)


def test_pallas_full_model_matches_capacity():
    """Whole preconditioned model under dispatch="pallas" equals "capacity"
    in outputs and in grads wrt params (flagship-style heterogeneous pools)."""
    from dataclasses import replace
    from hdmoe_tpu.models import precond_init, precond_apply
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg(num_experts=4, unet_kernel_sizes=((3, 3), (3, 3), (5, 5), (5, 5)),
                   vit_patch_sizes=(2, 4, 4, 8))
    params = precond_init(jax.random.PRNGKey(0), cfg)
    b = 6
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (b, 1, 1, 1)))
    txt = jax.random.normal(jax.random.PRNGKey(3), (b, 7, 12))
    mask = jnp.ones((b, 4))

    cap_cfg = replace(cfg, dispatch="capacity", capacity_factor=4.0)
    pal_cfg = replace(cfg, dispatch="pallas", capacity_factor=4.0)
    out_cap = precond_apply(params, cap_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    out_pal = precond_apply(params, pal_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_cap), atol=2e-5, rtol=2e-5)

    from jax.flatten_util import ravel_pytree

    def loss(p, c):
        return jnp.sum(precond_apply(p, c, x, sigma, txt, mask, mask, 0.0)["denoised"] ** 2)

    g_cap = jax.grad(lambda p: loss(p, cap_cfg))(params)
    g_pal = jax.grad(lambda p: loss(p, pal_cfg))(params)
    flat_c, _ = ravel_pytree(g_cap)
    flat_p, _ = ravel_pytree(g_pal)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_c), atol=5e-4, rtol=5e-4)


def test_stacked_pallas_matches_stacked():
    """moe_dispatch_stacked(use_pallas=True) == jnp path (EP bank dispatch)."""
    from hdmoe_tpu.models.moe_stacked import moe_dispatch_stacked, stacked_expert_init

    e, b = 4, 8
    x = jax.random.normal(KEY, (b, H, W, C))
    t = jnp.zeros((b, 4))
    gate = jax.nn.one_hot(jnp.array([0, 1, 2, 3, 0, 1, 2, 3]), e)

    def init_one(k):
        return {"s": jax.random.normal(k, ())}

    stacked = stacked_expert_init(jax.random.PRNGKey(5), e, init_one)

    def apply_fn(p, xx, tt, txt, *, train=False, key=None):
        return xx * p["s"]

    ref = moe_dispatch_stacked(x, stacked, apply_fn, gate, t, None, capacity=b)
    pal = moe_dispatch_stacked(x, stacked, apply_fn, gate, t, None, capacity=b,
                               use_pallas=True, top_k=1)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-6)

    g_ref = jax.grad(lambda s: jnp.sum(moe_dispatch_stacked(
        x, s, apply_fn, gate, t, None, capacity=b) ** 2))(stacked)
    g_pal = jax.grad(lambda s: jnp.sum(moe_dispatch_stacked(
        x, s, apply_fn, gate, t, None, capacity=b, use_pallas=True, top_k=1) ** 2))(stacked)
    np.testing.assert_allclose(np.asarray(g_pal["s"]), np.asarray(g_ref["s"]), rtol=1e-5)


def test_grouped_dispatch_matches_capacity():
    """Shape-class-grouped dispatch must equal plain capacity dispatch on the
    full heterogeneous model (flagship-style mixed kernels/patches)."""
    import jax
    from dataclasses import replace
    from hdmoe_tpu.models import precond_init, precond_apply
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg(num_experts=4, unet_kernel_sizes=((3, 3), (3, 3), (5, 5), (5, 5)),
                   vit_patch_sizes=(2, 4, 4, 8))
    params = precond_init(jax.random.PRNGKey(0), cfg)
    b = 6
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (b, 1, 1, 1)))
    txt = jax.random.normal(jax.random.PRNGKey(3), (b, 7, 12))
    mask = jnp.ones((b, 4))

    cap_cfg = replace(cfg, dispatch="capacity", capacity_factor=4.0)  # capacity=b: exact
    grp_cfg = replace(cfg, dispatch="grouped", capacity_factor=4.0)
    out_cap = precond_apply(params, cap_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    out_grp = precond_apply(params, grp_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    np.testing.assert_allclose(np.asarray(out_grp), np.asarray(out_cap), atol=2e-5, rtol=2e-5)

    dense_cfg = replace(cfg, dispatch="dense")
    out_dense = precond_apply(params, dense_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    np.testing.assert_allclose(np.asarray(out_grp), np.asarray(out_dense), atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# reroute_overflow (capacity_policy="priority") semantics
# ---------------------------------------------------------------------------


def test_reroute_overflow_noop_without_overflow():
    gate = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    probs = jnp.asarray([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3], [0.4, 0.6]])
    out = moe.reroute_overflow(gate, probs, capacity=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gate))


def test_reroute_overflow_keeps_most_confident_and_reroutes_rest():
    # 8 tokens all top-1 routed to expert 0 with distinct confidences;
    # capacity 4: the 4 most-confident keep expert 0, the other 4 move to
    # their second choice (expert 1), nobody is dropped.
    b = 8
    p0 = jnp.asarray([0.9, 0.8, 0.7, 0.6, 0.55, 0.54, 0.53, 0.52])
    probs = jnp.stack([p0, 1.0 - p0], axis=1)
    gate = jnp.stack([jnp.ones(b), jnp.zeros(b)], axis=1)
    out = np.asarray(moe.reroute_overflow(gate, probs, capacity=4))
    kept = out[:, 0] > 0
    assert kept.tolist() == [True, True, True, True, False, False, False, False]
    moved = out[:, 1] > 0
    assert moved.tolist() == [False, False, False, False, True, True, True, True]
    # total per-token weight preserved
    np.testing.assert_allclose(out.sum(axis=1), np.ones(b))


def test_reroute_overflow_never_targets_masked_experts():
    # expert 1 is specialization-masked (prob exactly 0): overflow from
    # expert 0 must stay dropped rather than leak onto the masked expert.
    b = 6
    probs = jnp.stack([jnp.ones(b), jnp.zeros(b)], axis=1)
    gate = jnp.stack([jnp.ones(b), jnp.zeros(b)], axis=1)
    out = np.asarray(moe.reroute_overflow(gate, probs, capacity=4))
    assert (out[:, 1] == 0).all()
    assert int((out[:, 0] > 0).sum()) == 4


def test_reroute_overflow_competition_for_leftover_capacity():
    # expert 1 already holds 3 native tokens (capacity 4 -> 1 leftover slot);
    # two overflow tokens from expert 0 compete for it — the more confident
    # (token 4: prob 0.45 for expert 1) wins, the other is dropped.
    gate = jnp.asarray([
        [1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [1.0, 0.0],
        [0.0, 1.0], [0.0, 1.0], [0.0, 1.0],
    ])
    probs = jnp.asarray([
        [0.9, 0.1], [0.8, 0.2], [0.7, 0.3], [0.6, 0.4],
        [0.55, 0.45], [0.58, 0.42],
        [0.2, 0.8], [0.3, 0.7], [0.4, 0.6],
    ])
    out = np.asarray(moe.reroute_overflow(gate, probs, capacity=4))
    # experts hold at most capacity tokens
    assert (out > 0).sum(axis=0).max() <= 4
    # top-4 confident keep expert 0
    assert (out[:4, 0] > 0).all()
    # token 4 (conf 0.45 for expert 1) wins the single leftover slot
    assert out[4, 1] == 1.0 and out[4, 0] == 0.0
    # token 5 (conf 0.42) loses and is dropped entirely
    assert out[5].sum() == 0.0
    # native expert-1 tokens untouched
    assert (out[6:, 1] > 0).all()


def test_priority_policy_engages_in_model_under_correlated_routing():
    """Model-level: with sigma-correlated routing (sampling regime: one
    sigma for the whole batch) and cf=1.0, the priority policy's rerouting
    actually engages (output differs from fcfs) and stays finite. The
    no-sample-dropped guarantee itself is pinned at the gate level by the
    reroute_overflow unit tests above; the quality claim is measured end to
    end on a trained checkpoint (artifacts/serving_dial_r3.json)."""
    from dataclasses import replace

    from hdmoe_tpu.models import default_model_config, precond_apply, precond_init

    cfg = default_model_config(
        img_resolution=8, internal_channels=16, time_emb_dim=16, text_emb_dim=0,
        num_experts=2, vit_patch_sizes=(2, 4), vit_emb_size=16, vit_num_blocks=1,
        vit_num_groups=4, vit_num_heads=4, unet_num_blocks=1,
        unet_model_channels=16, unet_kernel_sizes=((3, 3), (5, 5)),
        log_var_channels=8, dispatch="capacity", capacity_factor=1.0,
    )
    params = precond_init(jax.random.PRNGKey(0), cfg)
    b = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.full((b, 1, 1, 1), 0.5)  # one sigma for the whole batch

    def run(policy):
        c = replace(cfg, capacity_policy=policy)
        return precond_apply(params, c, x, sigma, None, None, None, 0.0)["denoised"]

    out_fcfs = run("fcfs")
    out_prio = run("priority")
    assert bool(jnp.isfinite(out_prio).all())
    # correlated routing at cf=1.0 overloads one expert -> the two policies
    # must actually select/reroute differently
    assert float(jnp.abs(out_prio - out_fcfs).max()) > 0.0


def test_priority_policy_grads_flow():
    from dataclasses import replace

    from hdmoe_tpu.models import default_model_config, precond_apply, precond_init

    cfg = default_model_config(
        img_resolution=8, internal_channels=16, time_emb_dim=16, text_emb_dim=0,
        num_experts=2, vit_patch_sizes=(2, 4), vit_emb_size=16, vit_num_blocks=1,
        vit_num_groups=4, vit_num_heads=4, unet_num_blocks=1,
        unet_model_channels=16, unet_kernel_sizes=((3, 3), (5, 5)),
        log_var_channels=8, dispatch="capacity", capacity_factor=1.0,
        capacity_policy="priority",
    )
    params = precond_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    sigma = jnp.full((4, 1, 1, 1), 0.5)

    def loss(p):
        return jnp.sum(
            precond_apply(p, cfg, x, sigma, None, None, None, 0.0)["denoised"] ** 2
        )

    g = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))


def test_einsum_dispatch_matches_capacity_exactly():
    """One-hot-matmul dispatch == gather/scatter dispatch, bit-grade on CPU
    fp32 (the movement is an exact row select; only the w*out product
    rounds, identically on both paths), including overflow drops."""
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jax.random.normal(jax.random.PRNGKey(4), (B, 4))
    txt = jax.random.normal(jax.random.PRNGKey(5), (B, 5, 8))  # 3-D: pooling path
    gate = jax.nn.one_hot(jnp.array([0, 1, 2, 0, 1, 2]), E) * 0.7

    def make(i):
        def fn(xx, tt, tx, *, train=False, key=None):
            return xx * (i + 1.0) + tt.mean() + tx.mean()

        return fn

    fns = [make(i) for i in range(E)]
    for cap in (B, 1):  # exact and overflow-dropping regimes
        ref = moe.moe_dispatch_capacity(x, fns, gate, t, txt, capacity=cap)
        got = moe.moe_dispatch_capacity_einsum(x, fns, gate, t, txt, capacity=cap)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-7, rtol=1e-7)


def test_einsum_dispatch_grads_match_capacity():
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    gate = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(6), (B, E)), axis=-1)
    gate = jnp.where(gate > 0.3, gate, 0.0)  # sparse, some rows multi-expert

    def loss(fn_dispatch, xx):
        return jnp.sum(fn_dispatch(xx, _make_experts(), gate, t, None, capacity=3) ** 2)

    g_ref = jax.grad(lambda xx: loss(moe.moe_dispatch_capacity, xx))(x)
    g_new = jax.grad(lambda xx: loss(moe.moe_dispatch_capacity_einsum, xx))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-6, rtol=1e-6)


def test_einsum_full_model_matches_capacity():
    """Whole preconditioned model under dispatch="einsum" equals "capacity"
    (outputs + grads), heterogeneous flagship-style pools."""
    from dataclasses import replace

    from hdmoe_tpu.models import precond_apply, precond_init
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg(num_experts=4, unet_kernel_sizes=((3, 3), (3, 3), (5, 5), (5, 5)),
                   vit_patch_sizes=(2, 4, 4, 8))
    params = precond_init(jax.random.PRNGKey(0), cfg)
    b = 6
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (b, 1, 1, 1)))
    txt = jax.random.normal(jax.random.PRNGKey(3), (b, 7, 12))
    mask = jnp.ones((b, 4))

    cap_cfg = replace(cfg, dispatch="capacity", capacity_factor=4.0)
    ein_cfg = replace(cfg, dispatch="einsum", capacity_factor=4.0)
    out_cap = precond_apply(params, cap_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    out_ein = precond_apply(params, ein_cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    np.testing.assert_allclose(np.asarray(out_ein), np.asarray(out_cap), atol=2e-5, rtol=2e-5)

    from jax.flatten_util import ravel_pytree

    def loss(p, c):
        return jnp.sum(precond_apply(p, c, x, sigma, txt, mask, mask, 0.0)["denoised"] ** 2)

    g_cap = jax.grad(lambda p: loss(p, cap_cfg))(params)
    g_ein = jax.grad(lambda p: loss(p, ein_cfg))(params)
    flat_c, _ = ravel_pytree(g_cap)
    flat_e, _ = ravel_pytree(g_ein)
    np.testing.assert_allclose(np.asarray(flat_e), np.asarray(flat_c), atol=5e-4, rtol=5e-4)


def test_einsum_dispatch_with_priority_policy_in_model():
    """dispatch="einsum" composes with capacity_policy="priority" (the
    serving fast-path combination) — finite output, equals the capacity
    dispatch under the same policy."""
    from dataclasses import replace

    from hdmoe_tpu.models import precond_apply, precond_init
    from tests.test_model import tiny_cfg

    cfg = tiny_cfg(num_experts=4, unet_kernel_sizes=((3, 3), (3, 3), (5, 5), (5, 5)),
                   vit_patch_sizes=(2, 4, 4, 8))
    params = precond_init(jax.random.PRNGKey(0), cfg)
    b = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.full((b, 1, 1, 1), 0.5)  # shared sigma: correlated routing
    txt = jax.random.normal(jax.random.PRNGKey(3), (b, 7, 12))
    mask = jnp.ones((b, 4))

    base = dict(dispatch="capacity", capacity_factor=1.0, capacity_policy="priority")
    out_cap = precond_apply(params, replace(cfg, **base), x, sigma, txt, mask, mask, 0.0)["denoised"]
    out_ein = precond_apply(params, replace(cfg, **{**base, "dispatch": "einsum"}),
                            x, sigma, txt, mask, mask, 0.0)["denoised"]
    assert np.isfinite(np.asarray(out_ein)).all()
    np.testing.assert_allclose(np.asarray(out_ein), np.asarray(out_cap), atol=2e-5, rtol=2e-5)


def test_stacked_einsum_matches_gather():
    """moe_dispatch_stacked(movement="einsum") == the gather path (values +
    grads), incl. folded gate weights in the combine contraction."""
    from hdmoe_tpu.models.moe_stacked import moe_dispatch_stacked, stacked_expert_init

    e, b = 4, 8
    x = jax.random.normal(KEY, (b, H, W, C))
    t = jnp.zeros((b, 4))
    gate = jax.nn.one_hot(jnp.array([0, 1, 2, 3, 0, 1, 2, 3]), e) * 0.9

    def init_one(k):
        return {"s": jax.random.normal(k, ())}

    stacked = stacked_expert_init(jax.random.PRNGKey(5), e, init_one)

    def apply_fn(p, xx, tt, txt, *, train=False, key=None):
        return xx * p["s"]

    for cap in (b, 2):  # exact and overflow-dropping regimes
        ref = moe_dispatch_stacked(x, stacked, apply_fn, gate, t, None, capacity=cap)
        ein = moe_dispatch_stacked(x, stacked, apply_fn, gate, t, None, capacity=cap,
                                   movement="einsum")
        np.testing.assert_allclose(np.asarray(ein), np.asarray(ref), rtol=1e-6, atol=1e-6)

    g_ref = jax.grad(lambda s: jnp.sum(moe_dispatch_stacked(
        x, s, apply_fn, gate, t, None, capacity=b) ** 2))(stacked)
    g_ein = jax.grad(lambda s: jnp.sum(moe_dispatch_stacked(
        x, s, apply_fn, gate, t, None, capacity=b, movement="einsum") ** 2))(stacked)
    np.testing.assert_allclose(np.asarray(g_ein["s"]), np.asarray(g_ref["s"]), rtol=1e-5)


def test_stacked_einsum_full_model_matches_stacked_gather():
    """Whole model: expert_sharing="stacked" + dispatch="einsum" equals the
    gather movement (the EP-scalable fast path)."""
    from dataclasses import replace

    from hdmoe_tpu.models import precond_apply, precond_init
    from tests.test_model import tiny_cfg

    cfg = replace(tiny_cfg(num_experts=4,
                           unet_kernel_sizes=((3, 3),) * 4,
                           vit_patch_sizes=(4, 4, 4, 4)),
                  expert_sharing="stacked", capacity_factor=2.0)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    b = 6
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 4))
    sigma = jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (b, 1, 1, 1)))
    txt = jax.random.normal(jax.random.PRNGKey(3), (b, 7, 12))
    mask = jnp.ones((b, 4))

    out_g = precond_apply(params, cfg, x, sigma, txt, mask, mask, 0.0)["denoised"]
    out_e = precond_apply(params, replace(cfg, dispatch="einsum"),
                          x, sigma, txt, mask, mask, 0.0)["denoised"]
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_g), atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# Round-5 load-profiled per-expert capacities (capacity_profile dial)
# ---------------------------------------------------------------------------


def test_per_expert_capacity_covers_load_equals_dense():
    """Per-expert capacities sized to the actual routed load keep every
    token — output equals dense for a top-1 sparse gate, in both the gather
    and the einsum movement."""
    x = jax.random.normal(KEY, (B, H, W, C))
    t = jnp.zeros((B, 4))
    idx = jnp.array([0, 0, 0, 0, 1, 2])  # loads [4, 1, 1]
    gate = jax.nn.one_hot(idx, E)
    dense = moe.moe_dispatch_dense(x, _make_experts(), gate, t, None)
    for fn in (moe.moe_dispatch_capacity, moe.moe_dispatch_capacity_einsum):
        out = fn(x, _make_experts(), gate, t, None, capacity=(4, 1, 1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   rtol=1e-5, atol=1e-6)


def test_per_expert_capacity_drops_only_overloaded_expert():
    x = jnp.ones((B, H, W, C))
    t = jnp.zeros((B, 4))
    idx = jnp.array([0, 0, 0, 1, 1, 2])  # loads [3, 2, 1]
    gate = jax.nn.one_hot(idx, E)
    out = moe.moe_dispatch_capacity(x, _make_experts(), gate, t, None,
                                    capacity=(2, 2, 1))
    got = np.asarray(out)
    np.testing.assert_allclose(got[2], np.zeros((H, W, C)))  # 3rd -> expert0 dropped
    np.testing.assert_allclose(got[0], np.ones((H, W, C)))
    np.testing.assert_allclose(got[3], 2 * np.ones((H, W, C)))  # expert1 kept
    np.testing.assert_allclose(got[5], 3 * np.ones((H, W, C)))  # expert2 kept


def test_reroute_overflow_vector_capacity():
    """Vector capacity matches scalar when uniform; respects per-expert
    limits when not."""
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (B, E)), axis=-1)
    top1 = jnp.argmax(probs, axis=1)
    w = jax.nn.one_hot(top1, E) * probs
    uni_s = moe.reroute_overflow(w, probs, 2)
    uni_v = moe.reroute_overflow(w, probs, jnp.array([2, 2, 2]))
    np.testing.assert_allclose(np.asarray(uni_s), np.asarray(uni_v))
    vec = moe.reroute_overflow(w, probs, jnp.array([B, B, B]))
    np.testing.assert_allclose(np.asarray(vec), np.asarray(w))  # nothing moves
    per = np.asarray(moe.reroute_overflow(w, probs, jnp.array([1, 1, 1])))
    assert ((per > 0).sum(axis=0) <= 1).all()  # per-expert cap respected


def test_capacity_profile_model_matches_dense(tmp_path):
    """Full tiny model: capacity_profile covering the whole batch per expert
    reproduces dense exactly (the no-drop guarantee at profile level)."""
    from dataclasses import replace

    from hdmoe_tpu.models import precond_apply, precond_init
    from tests.test_model import tiny_cfg

    cfg_d = tiny_cfg(dispatch="dense")
    cfg_p = replace(
        tiny_cfg(dispatch="einsum", capacity_policy="priority"),
        capacity_profile_unet=(1.0, 1.0), capacity_profile_vit=(1.0, 1.0))
    params = precond_init(KEY, cfg_d)
    b = 4
    x = jax.random.normal(jax.random.PRNGKey(5), (b, cfg_d.img_resolution,
                                                   cfg_d.img_resolution, cfg_d.in_channels))
    sigma = jnp.full((b, 1, 1, 1), 0.7)
    text = jax.random.normal(jax.random.PRNGKey(6), (b, 7, cfg_d.text_emb_dim))
    ones = jnp.ones((b, cfg_d.num_experts))
    outs = {}
    for nm, cfg in (("dense", cfg_d), ("profile", cfg_p)):
        outs[nm] = precond_apply(params, cfg, x, sigma, text, ones, ones, 0.0,
                                 transition_point=-1.2, softness=1.6)["denoised"]
    np.testing.assert_allclose(np.asarray(outs["profile"]), np.asarray(outs["dense"]),
                               rtol=2e-5, atol=2e-5)
