"""Transient-failure retry for device calls (aux-subsystem parity,
SURVEY.md §5 failure detection).

The axon TPU relay occasionally fails a step with a transient error —
remote-compile HTTP 500s on fresh shapes, or spurious RESOURCE_EXHAUSTED /
UNAVAILABLE from the backend (reproduced: the identical program succeeds on
immediate retry). The reference's only failure handling is HTTP retry x3
with linear backoff (hnsw_graph.cpp:184-209); this is the device-call analog.
"""

from __future__ import annotations

import time

_TRANSIENT = (
    "RESOURCE_EXHAUSTED",
    "UNAVAILABLE",
    "remote_compile",
    "DEADLINE_EXCEEDED",
    "INTERNAL",
)


def is_transient(exc: BaseException) -> bool:
    msg = str(exc)
    return any(t in msg for t in _TRANSIENT)


def device_retry(fn, attempts: int = 3, base_sleep: float = 5.0, log=None):
    """Run fn(); on a transient device/relay error retry with linear backoff.
    Non-transient errors propagate immediately."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:
            if attempt == attempts - 1 or not is_transient(exc):
                raise
            if log:
                log(
                    f"transient device error (attempt {attempt + 1}/"
                    f"{attempts}): {str(exc)[:120]} — retrying"
                )
            time.sleep(base_sleep * (attempt + 1))
