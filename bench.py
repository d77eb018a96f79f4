"""Benchmark: flagship HDMOEM 35-NFE EDM sampling throughput on one chip.

Prints one COMPLETE JSON line per phase; the driver parses the LAST line:

  line 1 (fast path, printed as soon as it completes): the headline number,
         with ``vs_baseline`` computed against the last recorded parity
         measurement (``parity_source: "cached"``).
  line 2 (parity phase, only if budget remains): the same headline with
         ``vs_baseline`` re-computed against a same-run fp32-dense parity
         measurement (``parity_source: "measured"``).

Round-3 post-mortem (VERDICT.md): the end-of-round bench was killed by the
driver's timeout during a tunnel wedge and produced *nothing* — the old
script compiled four executables before printing a single byte. This version
is ordered fast-path-first, prints incrementally, and converts any wedge
after line 1 into a clean exit so the scoreboard always gets a number.

North-star metric (BASELINE.md): images/sec/chip at 35-NFE EDM sampling
(18 Heun steps => 2*18-1 = 35 denoiser evals) on the reference config of
record (latent 32x32x4, 4 U-Net + 4 ViT experts, top-1 routing).

Two variants:
- ``fast``: bfloat16 + capacity dispatch at cf=1.0 (priority policy) + the
  small-head flash attention kernel on the transposed layout pipeline +
  batch 512 — every dial at its measured optimum (PERF.md rounds 2-3).
- ``parity``: float32, dense MoE dispatch at its own batch knee (128) —
  the reference algorithm verbatim (every expert runs every sample, fp32
  end to end), i.e. the closest measurable stand-in for "the reference's
  own number" on this chip, since the reference publishes no throughput
  numbers (BASELINE.md "published": {}). vs_baseline = fast / parity.

Budget design (all knobs in seconds, chosen to sit inside the driver's
observed kill window):
- device discovery watchdog 600 s: a fresh plugin init during a tunnel
  wedge blocks indefinitely; healthy discovery takes ~10 s.
- total deadline 1500 s: a warm-cache run takes ~3-5 min; a cold-compile
  run ~15-20 min. After FAST_LINE is out, any overrun exits 0 so the
  printed line stands; before it, exits 3 with a stderr diagnostic.
- parity is skipped (exit 0 on line 1) unless >= PARITY_MIN_BUDGET_S of
  the total deadline remains when the fast phase finishes.

Two additional layers keep the scoreboard from ever ending up empty:

1. AOT artifacts: after a successful live run, the compiled fast/parity
   sampler scans are serialized via ``jax.export`` into ``.jax_cache/``
   keyed by a source-tree hash. The next run deserializes instead of
   re-tracing (tracing the flagship scan dominates startup on small
   hosts), cutting time-to-line-1 from ~9 min to ~1-2 min warm.
2. Last-good replay: every successful emit is also written to
   ``artifacts/bench_last_good.json`` with a timestamp. If the tunnel is
   wedged (discovery or pre-line-1 hang), the watchdog REPLAYS that file
   as the JSON line — explicitly labeled ``"measurement": "replayed:..."``
   with the original measurement's age, so a replay is never mistaken for
   a fresh number — and exits 0. A missing last-good file preserves the
   old behavior (exit 3, no JSON).
"""

import json
import os
import sys
import time
from dataclasses import replace

import jax
import jax.numpy as jnp

# Per-path batch sizes, each at its measured optimum (round-3 batch
# sweeps; see artifacts/b128_validate_r3.json and parity_batch_probe.json).
FAST_BATCH = 512
PARITY_BATCH = 128
HEUN_STEPS = 18  # 2*18-1 = 35 NFE

# Last recorded parity measurement, used for line-1 vs_baseline until the
# same-run parity lands. Source: artifacts/bench_r3_insurance2.json (full
# driver-schema run on TPU v5 lite, 2026-08-20): fp32+dense b128.
CACHED_PARITY_IPS = 117.0335
CACHED_PARITY_SOURCE = "cached:artifacts/bench_r3_insurance2.json"

DISCOVERY_DEADLINE_S = float(os.environ.get("HDMOE_BENCH_DISCOVERY_S", 600))
TOTAL_DEADLINE_S = float(os.environ.get("HDMOE_BENCH_TOTAL_S", 1500))
PARITY_MIN_BUDGET_S = float(os.environ.get("HDMOE_BENCH_PARITY_MIN_S", 420))

_REPO = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD = os.path.join(_REPO, "artifacts", "bench_last_good.json")
AOT_DIR = os.path.join(_REPO, ".jax_cache")

_state = {"line_out": False, "t0": time.monotonic()}


def _elapsed():
    return time.monotonic() - _state["t0"]


def _replay_last_good(reason: str) -> bool:
    """Print the last in-round measured line, clearly labeled as a replay.

    Returns False when no last-good file exists (caller keeps the old
    no-score behavior)."""
    try:
        with open(LAST_GOOD) as f:
            rec = json.load(f)
        measured_at = rec.pop("_measured_unix", None)
        age_h = (time.time() - measured_at) / 3600.0 if measured_at else None
        rec["measurement"] = (
            f"replayed:artifacts/bench_last_good.json ({reason}; original "
            f"measured {age_h:.1f} h ago)" if age_h is not None
            else f"replayed:artifacts/bench_last_good.json ({reason})")
        print(json.dumps(rec), flush=True)
        return True
    except Exception:
        return False


def _watchdog(deadline_s: float, what: str):
    """Deadline guard against the axon tunnel wedging mid-bench.

    Before the first JSON line: replays the last in-round measurement
    (labeled as such) if one exists, else fires os._exit(3) with a
    diagnostic and no JSON. After the first line: fires os._exit(0), so
    the already-printed line IS the score. Returns cancel().
    """
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            if _state["line_out"]:
                print(
                    f"bench watchdog: {what} exceeded {deadline_s:.0f} s after "
                    "headline line printed - exiting 0, line 1 stands",
                    file=sys.stderr, flush=True)
                os._exit(0)
            print(
                f"bench watchdog: {what} still blocked after {deadline_s:.0f} s "
                "- TPU tunnel presumed wedged",
                file=sys.stderr, flush=True)
            if _replay_last_good(f"tunnel wedged during {what}"):
                os._exit(0)
            print("bench watchdog: no last-good measurement to replay, "
                  "aborting without a score", file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    return done.set


def _source_fingerprint() -> str:
    """Hash of the package + bench sources: AOT artifacts bake weights and
    model code as constants, so ANY source change must invalidate them."""
    import hashlib

    h = hashlib.sha256()
    files = [os.path.join(_REPO, "bench.py")]
    for root, _, names in os.walk(os.path.join(_REPO, "hdmoe_tpu")):
        files.extend(os.path.join(root, n) for n in sorted(names) if n.endswith(".py"))
    for f in sorted(files):
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


def _aot_path(tag: str, fingerprint: str) -> str:
    return os.path.join(AOT_DIR, f"bench_aot_{tag}_{fingerprint}.bin")


def _load_aot(tag: str, fingerprint: str):
    """Deserialize a previously exported sampler scan (skips tracing, the
    dominant startup cost on small hosts). Any failure -> None (live path)."""
    path = _aot_path(tag, fingerprint)
    try:
        with open(path, "rb") as f:
            exported = jax.export.deserialize(f.read())
        fn = jax.jit(exported.call)
        print(f"bench: {tag} AOT artifact loaded ({path})", file=sys.stderr, flush=True)
        return fn
    except Exception:
        return None


def _save_aot(tag: str, fingerprint: str, traced_fn, example) -> None:
    """Serialize the sampler scan for the next run. Re-traces once (the
    cost is paid here, inside a successful run, not at the next startup)."""
    try:
        os.makedirs(AOT_DIR, exist_ok=True)
        exported = jax.export.export(jax.jit(traced_fn))(example)
        path = _aot_path(tag, fingerprint)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        print(f"bench: {tag} AOT artifact saved ({path})", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: {tag} AOT save skipped ({type(e).__name__}: {e})",
              file=sys.stderr, flush=True)


def _make_sampler(cfg, params, text, noise, folded):
    import contextlib

    from hdmoe_tpu.models import precond_apply
    from hdmoe_tpu.ops import mp as mp_ops
    from hdmoe_tpu.sampler import EDMSamplerConfig, edm_sample, make_denoiser

    def precond_fn(x, sigma, text_emb, m1, m2, zeta, transition_point, softness):
        return precond_apply(
            params, cfg, x, sigma, text_emb, m1, m2, zeta,
            transition_point=transition_point, softness=softness,
        )

    denoiser = make_denoiser(precond_fn, cfg.num_experts, transition_point=-1.2, softness=1.6)
    scfg = EDMSamplerConfig(num_steps=HEUN_STEPS)
    raw_fn = lambda n: edm_sample(denoiser, n, text, scfg)  # noqa: E731
    # folded => weights pre-projected by the caller: trace with
    # normalize-at-use disabled (ahead-of-time compile pins the trace context)
    ctx = mp_ops.prenormalized_weights if folded else contextlib.nullcontext
    with ctx():
        sample = jax.jit(raw_fn).lower(noise).compile()
    return sample, denoiser, ctx, raw_fn


def _measure_scan(sample, noise, batch, n_runs=3):
    """Throughput of the compiled 35-NFE sampler scan.

    Completion barrier: fetch one element of the result. On the
    tunnel-attached chip, jax.block_until_ready on a remote array can
    return before the dispatch queue drains (round-3 finding: it "timed"
    the flagship train step at an impossible 6.8 ms); a value crossing
    the wire is the only trustworthy barrier. Costs one ~10 ms roundtrip
    per timed region — amortized over n_runs full 35-NFE walls.
    """
    out = sample(noise)
    float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = sample(noise)
    float(out[0, 0, 0, 0])
    elapsed = (time.perf_counter() - t0) / n_runs
    return batch / elapsed, elapsed


def _measure_standalone(denoiser, ctx, text, noise, batch):
    """Standalone single-eval jit call (pays per-dispatch tunnel overhead)."""
    sigma = jnp.full((batch, 1, 1, 1), 0.5)
    with ctx():
        fwd = jax.jit(lambda x: denoiser(x, sigma, text)).lower(noise).compile()
    r = fwd(noise)
    float(r[0, 0, 0, 0])
    # 50 runs so the one ~10 ms barrier roundtrip is <4% of the wall
    t0 = time.perf_counter()
    for _ in range(50):
        r = fwd(noise)
    float(r[0, 0, 0, 0])
    return (time.perf_counter() - t0) / 50 * 1000.0


def _emit(fast_ips, fast_wall, parity_ips, parity_source, dev, extras):
    rec = {
        "metric": "images/sec/chip @ 35-NFE EDM sampling (flagship 32x32x4, 4+4 experts)",
        "value": round(fast_ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(fast_ips / parity_ips, 4),
        # schema v2 (round-2 advisor fix): r01's "denoiser_step_ms" was the
        # standalone jit-call latency; the two measurements now carry
        # distinct keys (amortized-in-scan vs standalone call).
        "bench_schema": 2,
        "denoiser_step_amortized_ms": round(fast_wall / (2 * HEUN_STEPS - 1) * 1e3, 2),
        "parity_f32_dense_images_per_sec": round(parity_ips, 4),
        "parity_source": parity_source,
        "batch": FAST_BATCH,
        "parity_batch": PARITY_BATCH,
        "nfe": 2 * HEUN_STEPS - 1,
        "device": str(dev),
        "sample_wall_s": round(fast_wall, 3),
        "elapsed_s": round(_elapsed(), 1),
    }
    rec.update(extras)
    print(json.dumps(rec), flush=True)
    _state["line_out"] = True
    try:  # last-good replay source for a future wedged run
        os.makedirs(os.path.dirname(LAST_GOOD), exist_ok=True)
        with open(LAST_GOOD, "w") as f:
            json.dump({**rec, "_measured_unix": time.time()}, f)
    except Exception:
        pass


def main():
    from hdmoe_tpu.models import default_model_config, precond_init
    from hdmoe_tpu.train.optim import project_mp_weights

    # Device discovery is the usual wedge point (fresh plugin inits block
    # indefinitely during an outage); healthy discovery takes ~10 s.
    cancel = _watchdog(DISCOVERY_DEADLINE_S, "device discovery")
    dev = jax.devices()[0]
    cancel()
    _watchdog(TOTAL_DEADLINE_S - _elapsed(), "benchmark run")

    key = jax.random.PRNGKey(0)
    base_cfg = default_model_config()
    params = jax.jit(lambda k: precond_init(k, base_cfg))(key)

    def _inputs(batch):
        return (jax.random.normal(key, (batch, 77, base_cfg.text_emb_dim)),
                jax.random.normal(key, (batch, base_cfg.img_resolution,
                                        base_cfg.img_resolution, base_cfg.in_channels)))

    fingerprint = _source_fingerprint()

    # ---- FAST PATH FIRST (round-3 dials + round-4 einsum dispatch) --------
    # dispatch="einsum": one-hot MXU matmul token movement, +9.6% over the
    # gather/scatter capacity path same-session (311.8 -> 341.8 img/s,
    # artifacts/einsum_dispatch_ab_r4.json); bit-grade equal outputs.
    fast_cfg = replace(
        base_cfg, compute_dtype="bfloat16", dispatch="einsum",
        capacity_factor=1.0, use_flash=True, capacity_policy="priority",
    )
    text_f, noise_f = _inputs(FAST_BATCH)
    sample_f = _load_aot("fast", fingerprint)
    fast_live = sample_f is None
    if not fast_live:
        # An artifact can deserialize but still fail at FIRST EXECUTION
        # (platform mismatch, expired export-compat window). That must fall
        # back to the live path, not crash pre-line-1 with no JSON
        # (round-4 review finding).
        try:
            float(sample_f(noise_f)[0, 0, 0, 0])
        except Exception as e:
            print(f"bench: fast AOT artifact unusable at execution "
                  f"({type(e).__name__}: {e}); falling back to live build",
                  file=sys.stderr, flush=True)
            sample_f, fast_live = None, True
    if fast_live:
        print(f"bench: fast-path trace+compile starting at t={_elapsed():.0f}s",
              file=sys.stderr, flush=True)
        sample_f, denoiser_f, ctx_f, raw_f = _make_sampler(
            fast_cfg, project_mp_weights(params), text_f, noise_f, folded=True)
    fast_ips, fast_wall = _measure_scan(sample_f, noise_f, FAST_BATCH)
    _emit(fast_ips, fast_wall, CACHED_PARITY_IPS, CACHED_PARITY_SOURCE, dev, {})
    if fast_live:
        with ctx_f():
            _save_aot("fast", fingerprint, raw_f, noise_f)

    # ---- PARITY + extras, only with comfortable budget --------------------
    remaining = TOTAL_DEADLINE_S - _elapsed()
    if remaining < PARITY_MIN_BUDGET_S:
        print(f"bench: skipping parity phase ({remaining:.0f}s < "
              f"{PARITY_MIN_BUDGET_S:.0f}s budget) - line 1 stands",
              file=sys.stderr, flush=True)
        return
    text_p, noise_p = _inputs(PARITY_BATCH)
    sample_p = _load_aot("parity", fingerprint)
    parity_live = sample_p is None
    if not parity_live:
        try:  # same exec-time guard as the fast path; line 1 already stands
            float(sample_p(noise_p)[0, 0, 0, 0])
        except Exception as e:
            print(f"bench: parity AOT artifact unusable at execution "
                  f"({type(e).__name__}: {e}); falling back to live build",
                  file=sys.stderr, flush=True)
            sample_p, parity_live = None, True
    if parity_live:
        print(f"bench: parity trace+compile starting at t={_elapsed():.0f}s",
              file=sys.stderr, flush=True)
        sample_p, denoiser_p, ctx_p, raw_p = _make_sampler(
            base_cfg, params, text_p, noise_p, folded=False)
    parity_ips, parity_wall = _measure_scan(sample_p, noise_p, PARITY_BATCH)

    extras = {"parity_step_amortized_ms":
              round(parity_wall / (2 * HEUN_STEPS - 1) * 1e3, 2)}
    # standalone-call latencies are diagnostics; only measured on live
    # builds (they need the denoiser closure) with comfortable budget
    if (fast_live and parity_live
            and TOTAL_DEADLINE_S - _elapsed() >= PARITY_MIN_BUDGET_S):
        extras["denoiser_standalone_call_ms"] = round(
            _measure_standalone(denoiser_f, ctx_f, text_f, noise_f, FAST_BATCH), 2)
        extras["parity_f32_dense_step_ms"] = round(
            _measure_standalone(denoiser_p, ctx_p, text_p, noise_p, PARITY_BATCH), 2)
    _emit(fast_ips, fast_wall, parity_ips, "measured", dev, extras)
    if parity_live:
        _save_aot("parity", fingerprint, raw_p, noise_p)


if __name__ == "__main__":
    main()
