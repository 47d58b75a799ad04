"""Profiling/observability tests (the reference has no in-library tracing,
SURVEY.md §5)."""

from abc_tpu.runtime.dummy import DummyCiphertextFactory
from abc_tpu.utils.profiling import PhaseTimer, ProfilingFactory

from helpers import run_program


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("compute"):
        sum(range(1000))
    with t.phase("compute"):
        sum(range(1000))
    assert t.as_millis()["compute"] >= 0
    assert len(t.phases) == 1


def test_profiling_factory_counts_ops():
    factory = ProfilingFactory(DummyCiphertextFactory(64))
    rv, pairs = run_program(
        "secret int x = {1,2,3}; secret int y = {4,5,6};",
        "secret int s = x +++ y; s = s *** x; s = rotate(s, 1);",
        "out = s;", factory)
    report = {r["op"]: r["count"] for r in factory.report()}
    assert report["encrypt"] == 2
    assert report["add"] == 1
    assert report["multiply"] == 1
    assert report["rotate_rows"] == 1
    # decrypt the output through the profiled factory
    # s = (x+y)*x = [5,14,27], then rotated left by 1 → [14, 27, ...]
    assert factory.decrypt(pairs[0][1])[:2] == [14, 27]
    assert {r["op"] for r in factory.report()} >= {"decrypt"}


def test_profiled_ops_report_time_ordering():
    factory = ProfilingFactory(DummyCiphertextFactory(64))
    rv, pairs = run_program("secret int x = {1};", "x = x *** x;",
                            "y = x;", factory)
    rows = factory.report()
    assert all("total_ms" in r for r in rows)
    assert rows == sorted(rows, key=lambda r: -r["total_ms"])
