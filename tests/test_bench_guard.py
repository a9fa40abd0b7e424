"""bench.py's contended-machine guard (VERDICT r4 #8): the 2x perf gate
is meaningless if another Spark driver JVM shares the cores, so bench
must refuse to start rather than record polluted numbers."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_detects_live_foreign_spark_jvm(spark):
    # the pytest session's own Spark JVM is a CHILD of this process (not an
    # ancestor), so from bench's perspective it is exactly the foreign
    # driver the guard exists to catch
    spark.range(1).count()  # ensure the JVM is fully up
    jvms = bench._foreign_spark_jvms()
    assert jvms, "guard failed to see a live Spark driver JVM"
    # (the returned cmd is a truncated display snippet; the marker match
    # itself ran against the full cmdline inside _foreign_spark_jvms)
    assert all(isinstance(pid, int) and cmd for pid, cmd in jvms)


def test_guard_refuses_with_exit_code_2(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GUARD", "on")
    with pytest.raises(SystemExit) as exc:
        bench._guard_idle_machine(wait_s=0.0, poll_s=0.05)
    assert exc.value.code == 2


def test_guard_escape_hatch(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GUARD", "off")
    bench._guard_idle_machine(wait_s=0.0)  # no exit


def test_guard_passes_on_idle_machine(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_GUARD", "on")
    monkeypatch.setattr(bench, "_foreign_spark_jvms", lambda: [])
    bench._guard_idle_machine(wait_s=0.0)  # no exit


def test_ancestors_excluded():
    # our own pid chain must never count as "foreign"
    assert os.getpid() in bench._ancestor_pids()
    for pid, _ in bench._foreign_spark_jvms():
        assert pid not in bench._ancestor_pids()
