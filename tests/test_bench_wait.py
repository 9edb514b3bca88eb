"""bench.py's TPU-availability wait (driver-contract resilience).

The axon pool can be transiently UNAVAILABLE (fast error) or hang inside
device init; bench.py probes from killable subprocesses and retries within a
budget so a blip at round end doesn't zero the benchmark.
"""
import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _result(code, out="", err=""):
    r = types.SimpleNamespace()
    r.returncode, r.stdout, r.stderr = code, out, err
    return r


def test_wait_returns_immediately_on_healthy_probe(monkeypatch):
    calls = []

    def fake_run(cmd, timeout, capture_output, text):
        calls.append(cmd)
        return _result(0, "ok 2048.0\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: (_ for _ in ()).throw(
        AssertionError("healthy probe must not sleep")))
    bench._wait_for_tpu(budget_s=600)
    assert len(calls) == 1


def test_wait_retries_through_failures_then_succeeds(monkeypatch):
    outcomes = [
        _result(1, "", "RuntimeError: Unable to initialize backend 'axon'"),
        subprocess.TimeoutExpired(cmd="probe", timeout=600),
        _result(0, "ok 2048.0\n"),
    ]
    slept = []

    def fake_run(cmd, timeout, capture_output, text):
        o = outcomes.pop(0)
        if isinstance(o, Exception):
            raise o
        return o

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    bench._wait_for_tpu(budget_s=10_000)
    assert not outcomes          # all three probes consumed
    assert len(slept) == 2       # slept between attempts, not after success


def test_wait_budget_exhausts_and_aborts(monkeypatch):
    """Budget exhausted with the pool still down => loud exit(3), no hang.

    Proceeding would hang forever inside in-process device init (the last
    probe just failed), producing neither the JSON line nor a diagnostic.
    """
    n = [0]

    def fake_run(cmd, timeout, capture_output, text):
        n[0] += 1
        return _result(1, "", "UNAVAILABLE")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as exc:
        bench._wait_for_tpu(budget_s=0)   # deadline already passed after probe 1
    assert exc.value.code == 3
    assert n[0] == 1


def test_wait_budget_env_read_at_call_time(monkeypatch):
    """BENCH_TPU_WAIT_S set after `import bench` must still be honored."""
    monkeypatch.setenv("BENCH_TPU_WAIT_S", "0")

    def fake_run(cmd, timeout, capture_output, text):
        return _result(1, "", "UNAVAILABLE")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: (_ for _ in ()).throw(
        AssertionError("zero budget must not sleep")))
    with pytest.raises(SystemExit):
        bench._wait_for_tpu()   # no explicit budget: env var wins
