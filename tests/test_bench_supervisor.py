"""bench.py retry supervisor (`bench._supervise`).

Round-4 hardening for VERDICT r3 weak #1: the driver's round-3 bench run
died at a one-shot backend-init failure (`BENCH_r03.json rc=1`). The
supervisor probes the device in a subprocess, runs the real benchmark in
an inner subprocess, and retries both with backoff inside a BENCH_MAX_WAIT
budget. These tests drive that state machine with mocked subprocesses and
a mocked clock — no device, no sleeps.
"""
import importlib
import subprocess
import sys
import types

import pytest

bench = importlib.import_module("bench")


class FakeProc:
    def __init__(self, returncode=0, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def _patch(monkeypatch, script):
    """script: list of callables, one per subprocess.run call, each
    returning a FakeProc or raising. Sleeps advance a fake clock so the
    budget logic is exercised without wall time."""
    calls = iter(script)
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **k: next(calls)(*a, **k))
    clock = {"t": 1000.0}
    monkeypatch.setattr(bench.time, "time", lambda: clock["t"])

    def sleep(s):
        clock["t"] += s

    monkeypatch.setattr(bench.time, "sleep", sleep)
    return clock


def test_happy_path_forwards_final_json(monkeypatch, capsys):
    _patch(monkeypatch, [
        lambda *a, **k: FakeProc(0),                       # probe OK
        lambda *a, **k: FakeProc(0, stdout='# noise\n{"value": 1}\n'),
    ])
    assert bench._supervise() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-1] == '{"value": 1}'


def test_probe_failure_then_recovery(monkeypatch, capsys):
    _patch(monkeypatch, [
        lambda *a, **k: FakeProc(1, stderr="init failed"),  # probe fails
        lambda *a, **k: FakeProc(0),                        # probe OK
        lambda *a, **k: FakeProc(0, stdout='{"value": 2}\n'),
    ])
    assert bench._supervise() == 0
    assert capsys.readouterr().out.strip().endswith('{"value": 2}')


def test_inner_failure_retries(monkeypatch, capsys):
    _patch(monkeypatch, [
        lambda *a, **k: FakeProc(0),                        # probe OK
        lambda *a, **k: FakeProc(1, stdout="boom"),         # inner rc=1
        lambda *a, **k: FakeProc(0),                        # probe OK
        lambda *a, **k: FakeProc(0, stdout='{"value": 3}\n'),
    ])
    assert bench._supervise() == 0
    assert capsys.readouterr().out.strip().endswith('{"value": 3}')


def test_budget_exhaustion_returns_rc1(monkeypatch):
    monkeypatch.setenv("BENCH_MAX_WAIT", "60")

    def failing_probe(*a, **k):
        return FakeProc(1, stderr="down")

    _patch(monkeypatch, [failing_probe] * 10)
    assert bench._supervise() == 1


def test_probe_timeout_counts_as_failure(monkeypatch):
    monkeypatch.setenv("BENCH_MAX_WAIT", "60")

    def timing_out(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=600)

    _patch(monkeypatch, [timing_out] * 10)
    assert bench._supervise() == 1
