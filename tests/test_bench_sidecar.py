"""bench.py last-good sidecar: a tunnel outage at driver-snapshot time
must degrade to a labeled stale measurement, never to silent data loss
(BENCH_r03/r04 were both zeroed by outages)."""

import importlib
import json
import sys


def _load_bench(tmp_path, monkeypatch):
    # bench.py lives at the repo root; import it with its sidecar path
    # redirected into the test tmpdir so tests never touch the real one.
    root = __file__.rsplit("/tests/", 1)[0]
    monkeypatch.syspath_prepend(root)
    bench = importlib.import_module("bench")
    monkeypatch.setattr(bench, "_LAST_GOOD",
                        str(tmp_path / "BENCH_LAST_GOOD.json"))
    return bench


def test_record_and_load_roundtrip(tmp_path, monkeypatch):
    bench = _load_bench(tmp_path, monkeypatch)
    result = {"metric": "crops_per_sec_per_chip_e2e_256x192",
              "value": 6364.5, "unit": "crops/s"}
    bench._record_last_good(result)
    loaded = bench._load_last_good()
    assert loaded["value"] == 6364.5
    assert "measured_at" in loaded  # timestamped, so staleness is visible
    # the original dict is not mutated by the bookkeeping
    assert "measured_at" not in result


def test_load_missing_and_corrupt(tmp_path, monkeypatch):
    bench = _load_bench(tmp_path, monkeypatch)
    assert bench._load_last_good() is None
    (tmp_path / "BENCH_LAST_GOOD.json").write_text("{not json")
    assert bench._load_last_good() is None


def test_record_never_raises(tmp_path, monkeypatch):
    bench = _load_bench(tmp_path, monkeypatch)
    monkeypatch.setattr(bench, "_LAST_GOOD",
                        str(tmp_path / "no_such_dir" / "x.json"))
    bench._record_last_good({"value": 1})  # OSError swallowed by design


def test_probe_budget_env_alias(monkeypatch):
    # BENCH_BUDGET is the documented alias for BENCH_PROBE_BUDGET_S
    root = __file__.rsplit("/tests/", 1)[0]
    monkeypatch.syspath_prepend(root)
    bench = importlib.import_module("bench")
    monkeypatch.setenv("BENCH_BUDGET", "1")
    monkeypatch.delenv("BENCH_PROBE_BUDGET_S", raising=False)
    monkeypatch.setattr(bench, "_device_reachable", lambda timeout_s: False)
    assert bench._device_reachable_with_retry() is False
