"""The bench watchdog must never lose evidence: a device stall emits the
best JSON line available — partial measurements from this run first, the
last successful run's numbers (marked stale) second, zeros only when
neither exists. The TPU tunnel has real multi-hour outages (seen
2026-08-18/19), so this path is driver-facing, not hypothetical."""

import importlib
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    monkeypatch.setenv("STREAMFORMER_BENCH_DEADLINE_S", "0.01")
    sys.path.insert(0, REPO)
    import bench as b

    importlib.reload(b)  # fresh _PARTIAL/_EMITTED under the tiny deadline
    monkeypatch.setattr(b.os, "_exit", lambda code: None)
    monkeypatch.setattr(b, "_LAST_GOOD", str(tmp_path / "last_good.json"))
    captured: dict = {}
    monkeypatch.setattr(b, "_emit", lambda r: captured.update(r))
    return b, captured


def test_stale_fallback_when_nothing_measured(bench):
    b, captured = bench
    with open(b._LAST_GOOD, "w") as f:
        json.dump({"metric": "m", "value": 1913.92, "unit": "u",
                   "vs_baseline": 6.38, "note": "old-run note"}, f)
    b._watchdog()
    assert captured["value"] == 1913.92
    assert "note_stale" in captured and "watchdog" in captured["note"]
    assert captured.get("note") != "old-run note"


def test_partial_measurements_beat_stale(bench):
    b, captured = bench
    with open(b._LAST_GOOD, "w") as f:
        json.dump({"metric": "m", "value": 1913.92, "unit": "u",
                   "vs_baseline": 6.38}, f)
    b._PARTIAL.update({"metric": "m", "value": 123.0, "unit": "u",
                       "vs_baseline": 0.4})
    b._watchdog()
    assert captured["value"] == 123.0
    assert "note_stale" not in captured


def test_zero_line_without_history(bench):
    b, captured = bench
    b._watchdog()
    assert captured["value"] == 0.0 and "watchdog" in captured["note"]
