"""bench.py tunnel-wedge watchdog contract.

The driver runs bench.py unattended at end of round; if the axon tunnel is
wedged, PJRT calls block forever. The watchdog must (a) kill a blocked run
with exit code 3 and NO stdout JSON (a wedge must never be recorded as a
score), and (b) never fire once cancelled.
"""

import subprocess
import sys

REPO = __file__.rsplit("/tests/", 1)[0]


def _run(snippet: str, timeout: float = 60.0):
    return subprocess.run(
        [sys.executable, "-c", snippet],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORM_NAME": "cpu", "HOME": "/root"},
    )


def test_watchdog_kills_blocked_run_without_score():
    r = _run(
        "import bench, time\n"
        "bench._arm_watchdog(1.0 / 60, 'test-phase')\n"  # 1 s deadline
        "time.sleep(30)\n"
        "print('{\"metric\": \"should-never-print\"}')\n"
    )
    assert r.returncode == 3
    assert r.stdout.strip() == ""  # no JSON line reaches the driver
    assert "presumed wedged" in r.stderr


def test_watchdog_cancel_disarms():
    r = _run(
        "import bench, time\n"
        "cancel = bench._arm_watchdog(1.0 / 60, 'test-phase')\n"
        "cancel()\n"
        "time.sleep(2)\n"
        "print('survived')\n"
    )
    assert r.returncode == 0
    assert "survived" in r.stdout
