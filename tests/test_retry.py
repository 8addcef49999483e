"""device_retry: transient relay errors retry with backoff, real errors
propagate immediately (SURVEY.md §5 failure-detection parity)."""

import pytest

from hnsw_tpu.utils.retry import device_retry, is_transient


def test_retries_transient_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return 42

    assert device_retry(flaky, attempts=3, base_sleep=0.01) == 42
    assert len(calls) == 3


def test_non_transient_propagates_immediately():
    calls = []

    def broken():
        calls.append(1)
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        device_retry(broken, attempts=3, base_sleep=0.01)
    assert len(calls) == 1


def test_exhausted_attempts_raises():
    def always():
        raise RuntimeError("UNAVAILABLE: relay hiccup")

    with pytest.raises(RuntimeError):
        device_retry(always, attempts=2, base_sleep=0.01)


def test_is_transient():
    assert is_transient(RuntimeError("remote_compile failed: HTTP 500"))
    assert not is_transient(RuntimeError("assertion failed"))
