"""bench.py idle-qualification unit tests (r10 verdict item 1).

No Spark session: idle_wait() runs before the session exists by design,
so it is testable as a pure function of env + host state.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

EVIDENCE_KEYS = {
    "idle_qualified",
    "qualify_load_avg_1m",
    "qualify_probe_s",
    "qualify_probe_limit_s",
    "probe_idle_floor_s",
    "idle_waited_s",
    "idle_poll_attempts",
}


def test_idle_wait_emits_full_evidence(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_IDLE_WAIT_S", "0")
    out = bench.idle_wait()
    assert set(out) == EVIDENCE_KEYS
    assert isinstance(out["idle_qualified"], bool)
    assert out["qualify_probe_s"] > 0
    assert out["idle_poll_attempts"] == 1  # deadline 0 => single evaluation


def test_idle_wait_refuses_on_contended_probe(monkeypatch):
    # An impossible floor forces the probe branch to fail without having
    # to manufacture real host contention; deadline 0 keeps it instant.
    monkeypatch.setenv("SPARK_GRAFT_IDLE_WAIT_S", "0")
    monkeypatch.setattr(bench, "PROBE_IDLE_FLOOR_S", 0.0001)
    out = bench.idle_wait()
    assert out["idle_qualified"] is False
    assert out["qualify_probe_limit_s"] < out["qualify_probe_s"]


def test_idle_wait_waits_until_qualified(monkeypatch):
    # Deterministic host: load drops below 1 on the third poll; the probe
    # is patched to the floor so only load gates.  sleep is captured, not
    # slept, proving the poll cadence without wall-clock cost.
    loads = iter([(3.2, 0, 0), (1.4, 0, 0), (0.2, 0, 0)])
    slept: list[float] = []
    monkeypatch.setenv("SPARK_GRAFT_IDLE_WAIT_S", "600")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(loads))
    monkeypatch.setattr(bench, "cpu_probe", lambda: bench.PROBE_IDLE_FLOOR_S)
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    out = bench.idle_wait()
    assert out["idle_qualified"] is True
    assert out["idle_poll_attempts"] == 3
    assert slept == [20.0, 20.0]
    assert out["qualify_load_avg_1m"] == 0.2
