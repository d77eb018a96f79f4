"""dryrun_multichip driver-budget protections (round-5, VERDICT r4 item 1).

MULTICHIP_r04 was rc:124 — ten cold XLA:CPU train-step compiles overran the
driver timeout on a 1-core host. The protections mirrored from bench.py are
cheap contracts (the full 10-mode run is rehearsed out-of-suite, see
artifacts/dryrun_rehearsal_*_r5.log: cold 619 s for 9 modes vs warm 177 s
for all 10):

- a host-CPU-keyed persistent compile cache (same host => warm loads in
  seconds; different host => different key, never a cross-host SIGILL);
- per-mode wall-clock prints so a future kill is diagnosable from the tail;
- C++ stderr muted WITHOUT losing Python tracebacks (the AOT loader logs
  ~2.7 KB of spurious pseudo-feature errors per cache load, which would
  evict every timing line from the driver's recorded tail).
"""

import subprocess
import sys

REPO = __file__.rsplit("/tests/", 1)[0]


def test_host_keyed_cache_path_stable_and_feature_keyed():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    p1 = ge._host_keyed_cpu_cache()
    p2 = ge._host_keyed_cpu_cache()
    assert p1 == p2
    if p1 is not None:  # /proc/cpuinfo exists on this platform
        assert "/.jax_cache/cpu-" in p1
        key = p1.rsplit("cpu-", 1)[1]
        assert len(key) == 12 and all(c in "0123456789abcdef" for c in key)


def test_mode_clock_prints_lap_and_total(capsys):
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    clock = ge._ModeClock()
    clock.lap("mode X")
    out = capsys.readouterr().out
    assert "[dryrun timing] mode X:" in out and "total" in out
    assert clock.total() >= 0.0


def test_mute_cxx_stderr_keeps_python_tracebacks():
    """After _mute_cxx_stderr: raw fd-2 writes (the C++ log path) vanish,
    but a Python exception traceback still reaches the parent's stderr —
    the driver must see real failures in the tail."""
    snippet = (
        "import sys; sys.path.insert(0, %r)\n"
        "import os\n"
        "import __graft_entry__ as ge\n"
        "ge._mute_cxx_stderr()\n"
        "os.write(2, b'CXX_SPAM_LINE\\n')\n"
        "raise RuntimeError('PY_TRACEBACK_MARKER')\n" % REPO
    )
    r = subprocess.run([sys.executable, "-c", snippet], capture_output=True,
                       text=True, timeout=60,
                       env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                            "JAX_PLATFORM_NAME": "cpu"})
    assert r.returncode != 0
    assert "CXX_SPAM_LINE" not in r.stderr
    assert "PY_TRACEBACK_MARKER" in r.stderr
