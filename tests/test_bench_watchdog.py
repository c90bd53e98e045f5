"""The bench watchdog must never lose evidence OR fake it: a device stall
emits the best JSON line available — partial measurements from this run
first; with nothing measured, the live fields stay null and the last
successful run's numbers ride along only under ``stale_fallback`` (and only
when they were recorded on THIS host recently). The TPU tunnel has real
multi-hour outages (seen 2026-08-18/19), so this path is driver-facing, not
hypothetical. Contract per VERDICT r3 item 7 / ADVICE r3."""

import importlib
import json
import os
import platform
import sys
import time

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


def _write_last_good(b, **meta):
    stamp = {"host": platform.node(), "timestamp": time.time(),
             "commit": "abc1234"}
    stamp.update(meta)
    with open(b._LAST_GOOD, "w") as f:
        json.dump({"metric": "m", "value": 1913.92, "unit": "u",
                   "vs_baseline": 6.38, "_meta": stamp}, f)


def test_stale_numbers_never_occupy_live_fields(bench):
    b, captured = bench
    _write_last_good(b)
    b._watchdog()
    assert captured["value"] is None
    assert captured["vs_baseline"] is None
    assert captured["stale_fallback"]["value"] == 1913.92
    assert "watchdog" in captured["note"]


def test_partial_measurements_beat_stale(bench):
    b, captured = bench
    _write_last_good(b)
    b._PARTIAL.update({"metric": "m", "value": 123.0, "unit": "u",
                       "vs_baseline": 0.4})
    b._watchdog()
    assert captured["value"] == 123.0
    assert "stale_fallback" not in captured


def test_null_line_without_history(bench):
    b, captured = bench
    b._watchdog()
    assert captured["value"] is None
    assert "stale_fallback" not in captured
    assert "watchdog" in captured["note"]


def test_stale_rejected_from_other_host(bench):
    b, captured = bench
    _write_last_good(b, host="some-other-machine")
    b._watchdog()
    assert captured["value"] is None
    assert "stale_fallback" not in captured


def test_stale_rejected_when_too_old(bench):
    b, captured = bench
    _write_last_good(b, timestamp=time.time() - 30 * 86400)
    b._watchdog()
    assert captured["value"] is None
    assert "stale_fallback" not in captured
