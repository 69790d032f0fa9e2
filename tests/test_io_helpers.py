"""Unit tests for pipelines/io.py — the shared read + join-flake-retry
helpers (pure Python; no Ray session needed)."""

import pytest

from simple_crawler_ray.pipelines.io import retry_join_flake

_FLAKE_MSG = (
    "No match or multiple matches for key field reference "
    "FieldRef.Name(url) in schema"
)


def test_retry_join_flake_retries_then_succeeds():
    calls = {"n": 0}
    cleanups = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(_FLAKE_MSG)
        return "done"

    assert (
        retry_join_flake(flaky, attempts=3, cleanup=lambda: cleanups.__setitem__("n", cleanups["n"] + 1))
        == "done"
    )
    assert calls["n"] == 3
    # cleanup runs before each RETRY (not before the first attempt)
    assert cleanups["n"] == 2


def test_retry_join_flake_exhausts_and_reraises():
    def always_flaky():
        raise RuntimeError(_FLAKE_MSG)

    with pytest.raises(RuntimeError, match="No match or multiple matches"):
        retry_join_flake(always_flaky, attempts=3)


def test_retry_join_flake_propagates_other_errors_immediately():
    calls = {"n": 0}

    def real_bug():
        calls["n"] += 1
        raise ValueError("genuine logic error")

    with pytest.raises(ValueError, match="genuine logic error"):
        retry_join_flake(real_bug, attempts=3)
    assert calls["n"] == 1  # no retry for non-flake errors
