"""Serving layer tests: engine contract + HTTP server end-to-end."""

import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from hdmoe_tpu.models import precond_init
from hdmoe_tpu.serve import SamplerEngine
from tests.test_model import tiny_cfg


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    return SamplerEngine(cfg, params, batch=4, num_steps=2)


def test_engine_sample_contract(engine):
    imgs = engine.sample(["a flower", "a rose"], seed=1)
    assert imgs.shape == (2, 64, 64, 3) and imgs.dtype == np.uint8
    # deterministic per seed
    np.testing.assert_array_equal(engine.sample(["a flower", "a rose"], seed=1), imgs)
    assert not np.array_equal(engine.sample(["a flower", "a rose"], seed=2), imgs)


def test_engine_rejects_oversized(engine):
    with pytest.raises(AssertionError):
        engine.sample(["p"] * 5)


def test_coalesced_matches_serial(engine):
    """A request's images are identical whether it runs alone or coalesced
    with other requests (per-request noise seeds; S_churn=0 default)."""
    solo_a = engine.sample(["a flower"], seed=1)
    solo_b = engine.sample(["a rose", "a tulip"], seed=7)
    both = engine.sample_coalesced([(["a flower"], 1), (["a rose", "a tulip"], 7)])
    np.testing.assert_array_equal(both[0], solo_a)
    np.testing.assert_array_equal(both[1], solo_b)


def test_batching_frontend_concurrent_clients(engine):
    """Concurrent submits are safe (single worker owns the engine) and each
    client gets its own request's images back."""
    from hdmoe_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(engine)
    expected = {s: engine.sample(["p"], seed=s) for s in range(6)}
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
        t.join(timeout=120)
    assert not errors
    assert set(results) == set(range(6))
    for s in range(6):
        np.testing.assert_array_equal(results[s], expected[s])


def test_http_server_end_to_end(engine):
    # port 0: the OS assigns a free port, so a concurrently running pytest
    # process (or stale server) can never answer this test's requests
    from hdmoe_tpu.serve import make_server

    httpd = make_server(engine, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    time.sleep(0.5)

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["ok"] and health["batch"] == 4

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sample",
        data=json.dumps({"prompts": ["a flower"], "seed": 3}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert out["shape"] == [1, 64, 64, 3]
    assert out["latency_ms"] > 0
    assert out["format"] == "png"
    # response carries decodable PNGs
    import base64, io
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
    assert img.size == (64, 64)

    # malformed request -> clean 400
    bad = urllib.request.Request(
        f"http://127.0.0.1:{port}/sample", data=b"{}", headers={"Content-Type": "application/json"}
    )
    try:
        urllib.request.urlopen(bad, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "prompts" in json.loads(e.read())["error"]

    # /metrics: Prometheus text format reflecting the request above
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        metrics = r.read().decode()
    assert "hdmoe_requests_total 1" in metrics
    assert "hdmoe_images_total 1" in metrics
    assert "hdmoe_errors_total 0" in metrics
    assert 'hdmoe_request_latency_seconds{quantile="0.5"}' in metrics
    httpd.shutdown()


def test_serve_metrics_counters_and_buckets(engine):
    """ServeMetrics counts requests/images/errors/runs, tracks latency
    quantiles over a bounded window, and attributes runs to the bucket a
    BucketedEngine picked."""
    from hdmoe_tpu.serve import BatchingFrontend, ServeMetrics

    fe = BatchingFrontend(engine)
    fe.submit(["a", "b"], seed=0)
    fe.submit(["c"], seed=1)
    m = fe.metrics
    assert m.requests_total == 2 and m.images_total == 3 and m.errors_total == 0
    assert m.runs_total >= 1  # coalescing may merge the two
    text = m.render(queue_depth=0)
    assert "hdmoe_images_total 3" in text
    assert "hdmoe_request_latency_seconds_count 2" in text
    assert "hdmoe_queue_depth 0" in text

    # errors are counted, not hidden: a failing engine surfaces the
    # exception to the caller AND increments errors_total
    class Boom:
        batch = 2

        def dispatch_coalesced(self, reqs):
            raise RuntimeError("boom")

    fe2 = BatchingFrontend(Boom())
    with pytest.raises(RuntimeError, match="boom"):
        fe2.submit(["x"], seed=0)
    assert fe2.metrics.errors_total == 1 and fe2.metrics.images_total == 0

    # bucket attribution rides engine.last_bucket when present
    m3 = ServeMetrics()
    m3.record_run(2), m3.record_run(2), m3.record_run(4)
    assert 'hdmoe_bucket_runs_total{bucket="2"} 2' in m3.render()
    assert 'hdmoe_bucket_runs_total{bucket="4"} 1' in m3.render()


def test_dp_sharded_engine_matches_single_device():
    """DP-sharded sampling (batch over the mesh data axis, params
    replicated) produces the same images as the single-device engine."""
    from hdmoe_tpu.parallel.mesh import MeshConfig, make_mesh

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    n_data = min(4, jax.device_count())
    single = SamplerEngine(cfg, params, batch=n_data, num_steps=2)
    mesh = make_mesh(MeshConfig(data=n_data, model=jax.device_count() // n_data, expert=1))
    dp = SamplerEngine(cfg, params, batch=n_data, num_steps=2, mesh=mesh)
    # compare the sampled LATENTS (the compiled executables' outputs):
    # uint8 images can differ by a full quantization step where fp
    # reassociation under partitioning lands near a rounding cliff
    import jax.numpy as jnp

    noise = jax.random.normal(jax.random.PRNGKey(5), (n_data, cfg.img_resolution,
                                                      cfg.img_resolution, cfg.in_channels))
    text = single.clip.encode_text([f"p{i}" for i in range(n_data)])
    k = jax.random.PRNGKey(6)
    lat_a = np.asarray(single._sample(noise, text, k))
    lat_b = np.asarray(dp._sample(noise, jnp.asarray(text), k))
    # latents carry sigma_max-scale magnitudes (~1e2-1e3); fp32 reassociation
    # under GSPMD partitioning leaves sub-1e-3 relative drift
    np.testing.assert_allclose(lat_a, lat_b, rtol=1e-3, atol=1e-3)


def test_dp_engine_batch_must_divide_axis():
    from hdmoe_tpu.parallel.mesh import MeshConfig, make_mesh

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(MeshConfig(data=2, model=jax.device_count() // 2, expert=1))
    with pytest.raises(AssertionError, match="divide"):
        SamplerEngine(cfg, params, batch=3, num_steps=2, mesh=mesh)


def test_engine_dpmpp2m_solver(engine):
    """solver="dpmpp2m" compiles through the same AOT path, halves the NFE
    accounting, and produces images distinct from Heun's at the same seed."""
    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    e2 = SamplerEngine(cfg, params, batch=4, num_steps=2, solver="dpmpp2m")
    assert e2.nfe == 2 and engine.nfe == 3  # N vs 2N-1
    imgs = e2.sample(["a flower", "a rose"], seed=1)
    assert imgs.shape == (2, 64, 64, 3) and imgs.dtype == np.uint8
    np.testing.assert_array_equal(e2.sample(["a flower", "a rose"], seed=1), imgs)
    assert not np.array_equal(engine.sample(["a flower", "a rose"], seed=1), imgs)


def test_bucketed_engine_routing_and_consistency():
    """BucketedEngine routes to the smallest fitting bucket and (with the
    per-sample dense dispatch) a request's images are invariant to which
    bucket runs it (noise rows are the seed draw's leading rows in every
    bucket; jax PRNG counters are row-major)."""
    from hdmoe_tpu.serve import BucketedEngine

    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    be = BucketedEngine(cfg, params, buckets=(2, 4), num_steps=2)
    assert be.batch == 4 and be.pick_bucket(1) == 2 and be.pick_bucket(3) == 4

    one = be.sample(["a flower"], seed=3)
    assert be.last_bucket == 2 and one.shape == (1, 64, 64, 3)
    three = be.sample(["a flower", "b", "c"], seed=3)
    assert be.last_bucket == 4

    # cross-bucket consistency: same request, forced through the big bucket
    via_big = be.engines[4].sample(["a flower"], seed=3)
    a, b = one.astype(np.int32), via_big.astype(np.int32)
    assert float((a != b).mean()) <= 1e-3  # knife-edge uint8 flips only
    np.testing.assert_array_equal(three[:1], via_big)  # same bucket, same rows

    with pytest.raises(AssertionError, match="exceeds"):
        be.sample(["p"] * 5)

    # frontend drop-in: concurrent small requests ride the small bucket
    from hdmoe_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(be)
    np.testing.assert_array_equal(fe.submit(["a flower"], seed=3), one)


def test_http_server_mesh_dp():
    """DP-sharded serving end-to-end: the engine compiled over the 8-device
    mesh serves HTTP and produces the same images as a single-device engine
    (layout-only change)."""
    from hdmoe_tpu.parallel import MeshConfig, make_mesh
    from hdmoe_tpu.serve import make_server

    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(MeshConfig(data=8, model=1, expert=1))
    mesh_engine = SamplerEngine(cfg, params, batch=8, num_steps=2, mesh=mesh)
    solo_engine = SamplerEngine(cfg, params, batch=8, num_steps=2)
    # sharded float reductions reorder at ~1e-7, which the VAE decode +
    # uint8 quantization can amplify on isolated pixels (measured: 0.002%
    # of pixels differ, max 6/255). Pin near-identity; latent-level
    # equality is covered by the dryrun mode-6 test.
    a = mesh_engine.sample(["p"] * 8, seed=5).astype(np.int16)
    b = solo_engine.sample(["p"] * 8, seed=5).astype(np.int16)
    d = np.abs(a - b)
    assert (d > 0).mean() < 1e-3 and d.max() <= 16, (d.max(), (d > 0).mean())

    httpd = make_server(mesh_engine, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    time.sleep(0.5)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sample",
            data=json.dumps({"prompts": ["a flower"], "seed": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["shape"] == [1, 64, 64, 3]
    finally:
        httpd.shutdown()


def test_cli_serve_mesh_validation():
    """--mesh divisibility guards fire before any compile."""
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "-m", "hdmoe_tpu", "serve", "--batch-size", "3",
         "--mesh", "2"],
        capture_output=True, text=True, timeout=240,
        env={**__import__("os").environ, "JAX_PLATFORM_NAME": "cpu"},
    )
    assert r.returncode != 0
    assert "multiple of" in (r.stderr + r.stdout)


def test_dispatch_fetch_matches_sample_coalesced(engine):
    """The staged dispatch/fetch pair is exactly sample_coalesced split in
    two (the pipelined frontend's contract)."""
    reqs = [(["a flower"], 1), (["a rose", "a tulip"], 7)]
    direct = engine.sample_coalesced(reqs)
    staged = engine.fetch_dispatched(engine.dispatch_coalesced(reqs))
    for a, b in zip(direct, staged):
        np.testing.assert_array_equal(a, b)


def test_bucketed_dispatch_fetch_and_pipelined_frontend():
    """BucketedEngine's staged pair routes to the right bucket and a
    pipelined frontend over it returns per-request images (the in-flight
    handle carries its owning engine across bucket switches)."""
    from hdmoe_tpu.serve import BatchingFrontend, BucketedEngine

    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    be = BucketedEngine(cfg, params, buckets=(1, 4), num_steps=2)
    staged = be.fetch_dispatched(be.dispatch_coalesced([(["p"], 3)]))
    assert be.last_bucket == 1
    np.testing.assert_array_equal(staged[0], be.sample(["p"], seed=3))

    fe = BatchingFrontend(be, pipeline=True)
    exp = {s: be.sample(["p"], seed=s) for s in range(4)}
    for s in range(4):  # sequential back-to-back: each drains the pipeline
        np.testing.assert_array_equal(fe.submit(["p"], seed=s), exp[s])


def test_frontend_pipeline_concurrent_correctness(engine):
    """Concurrent submits through the PIPELINED frontend each get their own
    request's images (overlapped batches don't swap results)."""
    from hdmoe_tpu.serve import BatchingFrontend

    fe = BatchingFrontend(engine, pipeline=True)
    expected = {s: engine.sample(["p"], seed=s) for s in range(8)}
    results: dict = {}
    errors: list = []

    def client(s):
        try:
            results[s] = fe.submit(["p"], seed=s)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=client, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors and set(results) == set(range(8))
    for s in range(8):
        np.testing.assert_array_equal(results[s], expected[s])


def test_frontend_fetch_error_propagates():
    """Device errors surface at the FETCH under async dispatch; the
    pipelined frontend hands them to the batch's submitters (and keeps
    serving afterwards)."""
    from hdmoe_tpu.serve import BatchingFrontend

    class FetchBoom:
        batch = 4

        def dispatch_coalesced(self, requests):
            return ("handle", requests)

        def fetch_dispatched(self, pending):
            raise RuntimeError("boom at fetch")

    fe = BatchingFrontend(FetchBoom(), pipeline=True)
    with pytest.raises(RuntimeError, match="boom at fetch"):
        fe.submit(["p"], seed=0)
    assert fe.metrics.errors_total == 1
    with pytest.raises(RuntimeError, match="boom at fetch"):
        fe.submit(["q"], seed=1)
    assert fe.metrics.errors_total == 2


def test_engine_guidance_active():
    """``SamplerEngine(guidance=g)`` must actually guide (round-3 fix: the
    engine used to call ``make_denoiser`` without guidance/uncond, so
    ``serve --guidance`` was silently inert). Pins (a) g != 1.0 changes the
    images and (b) the engine path equals a manually-built CFG denoiser with
    the empty-prompt uncond reference (generate.py:83-84 semantics)."""
    import jax.numpy as jnp

    from hdmoe_tpu.adapters import make_text_encoder, make_vae
    from hdmoe_tpu.models.hdmoem import precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler.edm import EDMSamplerConfig, edm_sample, make_denoiser
    from hdmoe_tpu.train.optim import project_mp_weights

    cfg = tiny_cfg()
    params = precond_init(jax.random.PRNGKey(0), cfg)
    prompts = ["a flower", "a rose"]
    e1 = SamplerEngine(cfg, params, batch=2, num_steps=2, guidance=1.0)
    e3 = SamplerEngine(cfg, params, batch=2, num_steps=2, guidance=3.0)
    unguided = e1.sample(prompts, seed=1)
    guided = e3.sample(prompts, seed=1)
    assert not np.array_equal(unguided, guided)

    folded = project_mp_weights(params)
    clip = make_text_encoder("fake", width=cfg.text_emb_dim)
    text = clip.encode_text(prompts)
    uncond = clip.encode_text(["", ""])

    def precond_fn(x, s, te, m1, m2, zeta, transition_point, softness):
        return precond_apply(folded, cfg, x, s, te, m1, m2, zeta,
                             transition_point=transition_point, softness=softness)

    den = make_denoiser(precond_fn, cfg.num_experts, -1.2, 1.6,
                        guidance=3.0, uncond_text_emb=uncond)
    scfg = EDMSamplerConfig(num_steps=2, guidance=3.0)
    k_noise, k_churn = jax.random.split(jax.random.PRNGKey(1))
    noise = jax.random.normal(
        k_noise, (2, cfg.img_resolution, cfg.img_resolution, cfg.in_channels))
    with mp_ops.prenormalized_weights():
        latents = jax.jit(lambda n, k: edm_sample(den, n, text, scfg, key=k))(
            noise, k_churn)
    vae = make_vae("fake", target_std=cfg.sigma_data)
    expected = np.asarray(vae.decode(jnp.asarray(latents)))
    np.testing.assert_array_equal(guided, expected)


def test_dp_sharded_engine_einsum_dispatch_matches_single_device():
    """dispatch="einsum" (one-hot MXU matmul token movement, the round-4
    serving fast path) composes with DP-sharded sampling: same latents as
    the single-device einsum engine under GSPMD partitioning."""
    from dataclasses import replace as _replace

    from hdmoe_tpu.parallel.mesh import MeshConfig, make_mesh

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    cfg = _replace(tiny_cfg(), dispatch="einsum", capacity_factor=1.0,
                   capacity_policy="priority")
    params = precond_init(jax.random.PRNGKey(0), cfg)
    n_data = min(4, jax.device_count())
    single = SamplerEngine(cfg, params, batch=n_data, num_steps=2)
    mesh = make_mesh(MeshConfig(data=n_data, model=jax.device_count() // n_data, expert=1))
    dp = SamplerEngine(cfg, params, batch=n_data, num_steps=2, mesh=mesh)
    import jax.numpy as jnp

    noise = jax.random.normal(jax.random.PRNGKey(5), (n_data, cfg.img_resolution,
                                                      cfg.img_resolution, cfg.in_channels))
    text = single.clip.encode_text([f"p{i}" for i in range(n_data)])
    k = jax.random.PRNGKey(6)
    lat_a = np.asarray(single._sample(noise, text, k))
    lat_b = np.asarray(dp._sample(noise, jnp.asarray(text), k))
    np.testing.assert_allclose(lat_a, lat_b, rtol=1e-3, atol=1e-3)
