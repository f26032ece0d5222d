"""tools/bench_compare.py — ambient-vs-compute delta attribution
(VERDICT r12 #4).  Pure-Python classification, no Spark needed."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_compare import classify


OLD = {
    "git_sha": "aaa",
    "loadavg_1m_start": 1.0,
    "loadavg_1m": 1.0,
    "queries": {"a": 1.0, "b": 1.0, "c": 1.0, "gone": 1.0},
    "task_time": {"a": 1.0, "b": 1.0, "c": 1.0, "gone": 1.0},
}
NEW = {
    "git_sha": "bbb",
    "loadavg_1m_start": 5.0,
    "loadavg_1m": 6.0,
    "queries": {"a": 1.05, "b": 2.0, "c": 2.0, "new": 1.0},
    "task_time": {"a": 1.0, "b": 1.02, "c": 2.0, "new": 1.0},
}


def test_kinds():
    rep = classify(OLD, NEW)
    kinds = {r["query"]: r["kind"] for r in rep["rows"]}
    # b: wall doubled, executors flat → host noise; c: executors
    # doubled → real compute delta; a: inside the band
    assert kinds == {"a": "flat", "b": "ambient", "c": "compute"}


def test_added_removed_and_totals():
    rep = classify(OLD, NEW)
    assert rep["added"] == ["new"] and rep["removed"] == ["gone"]
    assert rep["shared_queries"] == 3
    assert rep["task_total_ratio"] == round(4.02 / 3.0, 3)


def test_missing_task_time_degrades_to_wall_only():
    old = {"queries": {"x": 1.0}, "task_time": {}}
    new = {"queries": {"x": 3.0}, "task_time": {}}
    rep = classify(old, new)
    assert rep["rows"][0]["kind"] == "wall-only"


def test_speedup_is_also_compute():
    old = {"queries": {"x": 2.0}, "task_time": {"x": 2.0}}
    new = {"queries": {"x": 1.0}, "task_time": {"x": 1.0}}
    rep = classify(old, new)
    assert rep["rows"][0]["kind"] == "compute"
