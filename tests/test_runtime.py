"""Backend auto-selection (utils/runtime.py).

The product latency contract: memo-scale DBs must answer like the CPU
reference (~0.1 s, memo_cli.py:292), so `auto` routes small corpora to
CPU and reserves the TPU for corpus-scale work (VERDICT round 1, item 2).
"""

import pytest

from c99_vectordb_tpu.utils.runtime import platform_decision, select_platform


@pytest.mark.parametrize(
    "choice,ntotal,threshold,expected",
    [
        ("auto", 3, 100_000, "cpu"),
        ("auto", 99_999, 100_000, "cpu"),
        ("auto", 100_000, 100_000, None),
        ("auto", 10_000_000, 100_000, None),
        ("", 3, 100_000, "cpu"),  # unset env behaves as auto
        ("AUTO", 3, 100_000, "cpu"),
        ("cpu", 10_000_000, 100_000, "cpu"),  # explicit cpu always wins
        ("tpu", 3, 100_000, None),  # explicit tpu -> keep process default
        ("default", 3, 100_000, None),
        ("axon", 3, 100_000, "axon"),  # explicit platform passes through
        ("auto", 50, 10, None),  # custom threshold respected
    ],
)
def test_platform_decision(choice, ntotal, threshold, expected):
    assert platform_decision(choice, ntotal, threshold) == expected


def test_select_platform_is_idempotent_and_safe(monkeypatch):
    # conftest already forces cpu; selecting again must not raise and must
    # report the same decision on repeat calls (first call locks).
    monkeypatch.setenv("C99VDB_PLATFORM", "auto")
    first = select_platform(3)
    second = select_platform(3)
    assert first == second == "cpu"


def test_select_platform_env_threshold(monkeypatch):
    monkeypatch.setenv("C99VDB_PLATFORM", "auto")
    monkeypatch.setenv("C99VDB_CPU_THRESHOLD", "5")
    # Decision is still computed per call even after the lock.
    assert select_platform(4) == "cpu"
    assert select_platform(6) is None
