"""Continuous-batching (serve_stream.py) tests.

The load-bearing property is EXACTNESS: under per-sample dispatch a
streamed slot's trajectory is bit-independent of its neighbors, so every
test here pins streamed output against the lockstep SamplerEngine's images
for the same (prompts, seed) — including mid-flight admission, K>1 tick
granularity, both solvers, and the threaded frontend.
"""

import threading

import jax
import numpy as np
import pytest

from hdmoe_tpu.models import precond_init
from hdmoe_tpu.serve import SamplerEngine
from hdmoe_tpu.serve_stream import StreamingEngine, StreamingFrontend
from tests.test_model import tiny_cfg

STEPS = 3


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    lockstep = SamplerEngine(cfg, params, batch=4, num_steps=STEPS)
    return cfg, params, lockstep


def _run_to_completion(eng, admits):
    """Drive ``eng`` with ``admits`` = {tick_no: [(slot, seed, j, text_row)]};
    returns {slot: decoded image} captured at each slot's finishing tick."""
    images = {}
    t = 0
    pending = {r for adm in admits.values() for (r, *_rest) in adm}
    while pending or any(adm for k, adm in admits.items() if k >= t):
        for r, seed, j, text_row in admits.get(t, []):
            eng.admit_slot(r, seed, j, text_row)
        finished = eng.tick()
        t += 1
        if len(finished):
            rows = [int(r) for r in finished if r in pending]
            for r, img in zip(rows, eng.decode_rows(rows)):
                images[r] = img
                pending.discard(r)
        assert t < 100, "streaming engine failed to converge"
    return images


def test_stream_matches_lockstep_heun(setup):
    cfg, params, lockstep = setup
    eng = StreamingEngine(cfg, params, batch=4, num_steps=STEPS)
    expected = lockstep.sample(["a flower", "a rose"], seed=1)
    text = eng.encode_text(["a flower", "a rose"])
    imgs = _run_to_completion(
        eng, {0: [(0, 1, 0, text[0]), (1, 1, 1, text[1])]}
    )
    np.testing.assert_array_equal(imgs[0], expected[0])
    np.testing.assert_array_equal(imgs[1], expected[1])


def test_staggered_admission_is_exact(setup):
    """A request admitted while its neighbor is mid-trajectory reproduces its
    solo lockstep images exactly (per-sample dispatch independence) — the
    defining property continuous batching must not break."""
    cfg, params, lockstep = setup
    eng = StreamingEngine(cfg, params, batch=4, num_steps=STEPS)
    solo_a = lockstep.sample(["a flower"], seed=1)
    solo_b = lockstep.sample(["a tulip"], seed=7)
    ta = eng.encode_text(["a flower"])
    tb = eng.encode_text(["a tulip"])
    imgs = _run_to_completion(
        eng, {0: [(0, 1, 0, ta[0])], 2: [(3, 7, 0, tb[0])]}
    )
    np.testing.assert_array_equal(imgs[0], solo_a[0])
    np.testing.assert_array_equal(imgs[3], solo_b[0])


def test_slot_reuse_after_finish(setup):
    """A freed slot re-admitted with a new request still reproduces lockstep
    output (admission fully resets x / old_d / idx for that slot)."""
    cfg, params, lockstep = setup
    eng = StreamingEngine(cfg, params, batch=4, num_steps=STEPS)
    solo_a = lockstep.sample(["a flower"], seed=1)
    solo_b = lockstep.sample(["a rose"], seed=9)
    text = eng.encode_text(["a flower"])
    imgs1 = _run_to_completion(eng, {0: [(0, 1, 0, text[0])]})
    np.testing.assert_array_equal(imgs1[0], solo_a[0])
    text_b = eng.encode_text(["a rose"])
    imgs2 = _run_to_completion(eng, {0: [(0, 9, 0, text_b[0])]})
    np.testing.assert_array_equal(imgs2[0], solo_b[0])


def test_dpmpp2m_stream_matches_lockstep(setup):
    cfg, params, _ = setup
    lockstep = SamplerEngine(cfg, params, batch=4, num_steps=4, solver="dpmpp2m")
    eng = StreamingEngine(cfg, params, batch=4, num_steps=4, solver="dpmpp2m")
    expected = lockstep.sample(["a flower", "a rose"], seed=3)
    text = eng.encode_text(["a flower", "a rose"])
    # stagger: second prompt enters one tick late, multistep history must
    # stay per-slot (old_d freeze for idle/finished slots)
    imgs = _run_to_completion(
        eng, {0: [(0, 3, 0, text[0])], 1: [(2, 3, 1, text[1])]}
    )
    np.testing.assert_array_equal(imgs[0], expected[0])
    np.testing.assert_array_equal(imgs[2], expected[1])


def test_ticks_per_call_equivalence(setup):
    """K ticks chained in one device call give the same images as K calls
    (admission granularity changes; math must not)."""
    cfg, params, lockstep = setup
    eng = StreamingEngine(cfg, params, batch=4, num_steps=STEPS, ticks_per_call=2)
    expected = lockstep.sample(["a flower"], seed=5)
    text = eng.encode_text(["a flower"])
    imgs = _run_to_completion(eng, {0: [(0, 5, 0, text[0])]})
    np.testing.assert_array_equal(imgs[0], expected[0])
    # 3 steps at K=2 -> 2 device calls, 4 ticks issued
    assert eng.calls_total == 2 and eng.ticks_total == 4


def test_unconditional_config_stream(setup):
    """text_emb_dim=0 path: no text carry at all."""
    cfg = tiny_cfg(text_emb_dim=0)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    lockstep = SamplerEngine(cfg, params, batch=2, num_steps=STEPS)
    eng = StreamingEngine(cfg, params, batch=2, num_steps=STEPS)
    expected = lockstep.sample(["", ""], seed=2)
    imgs = _run_to_completion(eng, {0: [(0, 2, 0, None), (1, 2, 1, None)]})
    np.testing.assert_array_equal(imgs[0], expected[0])
    np.testing.assert_array_equal(imgs[1], expected[1])


def test_streaming_frontend_concurrent_clients(setup):
    """Concurrent submits through the scheduler thread each get their own
    request's lockstep-exact images back, whatever slot packing occurred."""
    cfg, params, lockstep = setup
    eng = StreamingEngine(cfg, params, batch=4, num_steps=STEPS)
    fe = StreamingFrontend(eng)
    expected = {s: lockstep.sample(["p"], seed=s) for s in range(6)}
    results: dict = {}
    errors: list = []

    def client(s):
        try:
            results[s] = fe.submit(["p"], seed=s)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=client, args=(s,)) for s in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert set(results) == set(range(6))
    for s in range(6):
        np.testing.assert_array_equal(results[s], expected[s])
    assert fe.metrics.requests_total == 6 and fe.metrics.images_total == 6


def test_streaming_frontend_multiprompt_and_fifo(setup):
    """A multi-prompt request is delivered whole (all its slots finish) and
    matches lockstep; the engine ends fully drained."""
    cfg, params, lockstep = setup
    eng = StreamingEngine(cfg, params, batch=4, num_steps=STEPS)
    fe = StreamingFrontend(eng)
    expected = lockstep.sample(["a", "b", "c"], seed=11)
    got = fe.submit(["a", "b", "c"], seed=11)
    np.testing.assert_array_equal(got, expected)
    assert eng.active_slots == 0
    with pytest.raises(AssertionError):
        fe.submit(["p"] * 5, seed=0)  # > engine batch


def test_http_server_with_streaming_frontend(setup):
    """make_server(frontend=StreamingFrontend) serves /sample + /metrics."""
    import base64
    import io
    import json
    import urllib.request

    from hdmoe_tpu.serve import make_server

    cfg, params, lockstep = setup
    eng = StreamingEngine(cfg, params, batch=4, num_steps=STEPS)
    httpd = make_server(eng, port=0, frontend=StreamingFrontend(eng))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"prompts": ["a flower"], "seed": 1}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sample", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert len(out["images"]) == 1
        png = base64.b64decode(out["images"][0])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        expected = lockstep.sample(["a flower"], seed=1)
        try:
            from PIL import Image

            arr = np.asarray(Image.open(io.BytesIO(png)))
            np.testing.assert_array_equal(arr, expected[0])
        except ImportError:
            pass
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=60
        ) as r:
            metrics = r.read().decode()
        assert "hdmoe_requests_total 1" in metrics
    finally:
        httpd.shutdown()


def test_guidance_stream_matches_lockstep(setup):
    """CFG in the streaming engine (guidance + empty-prompt uncond rows)
    equals the lockstep engine's guided images."""
    cfg, params, _ = setup
    lockstep = SamplerEngine(cfg, params, batch=2, num_steps=STEPS, guidance=2.0)
    eng = StreamingEngine(cfg, params, batch=2, num_steps=STEPS, guidance=2.0)
    expected = lockstep.sample(["a flower", "a rose"], seed=4)
    text = eng.encode_text(["a flower", "a rose"])
    imgs = _run_to_completion(
        eng, {0: [(0, 4, 0, text[0]), (1, 4, 1, text[1])]}
    )
    np.testing.assert_array_equal(imgs[0], expected[0])
    np.testing.assert_array_equal(imgs[1], expected[1])


def test_stream_rejects_churn(setup):
    cfg, params, _ = setup
    from hdmoe_tpu.sampler.edm import EDMSamplerConfig, make_denoiser
    from hdmoe_tpu.serve_stream import make_stream_tick

    with pytest.raises(ValueError, match="churn"):
        make_stream_tick(lambda x, s, t: x, EDMSamplerConfig(num_steps=2, s_churn=1.0))
