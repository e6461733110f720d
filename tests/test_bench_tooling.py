"""Contracts of the bench artifact tooling (no Spark session needed):
the load gate's degraded stamp, and bench_diff's zero-guard /
loadavg-header behavior (r11 advice + verdict #6)."""

from __future__ import annotations

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_emit_stamps_degraded_and_start_load(monkeypatch):
    bench = _load("bench_under_test", os.path.join(REPO, "bench.py"))
    monkeypatch.setattr(bench, "_START_LOAD", 7.5)
    monkeypatch.setattr(bench, "_DEGRADED", True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit({"q": 1.0}, "0.1")
    art = json.loads(buf.getvalue())
    assert art["degraded"] is True
    assert art["loadavg_start"] == 7.5
    assert art["queries"] == {"q": 1.0} and art["sf"] == 0.1
    # clean run: no degraded key at all (absence IS the green signal)
    monkeypatch.setattr(bench, "_DEGRADED", False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit({"q": 1.0}, "0.1")
    assert "degraded" not in json.loads(buf.getvalue())


def _run_diff(tmp_path, old, new, threshold="9.9"):
    a, b = tmp_path / "old.json", tmp_path / "new.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    diff = _load("bench_diff_under_test", os.path.join(REPO, "tools", "bench_diff.py"))
    argv = sys.argv
    sys.argv = ["bench_diff.py", str(a), str(b), "--threshold", threshold]
    buf = io.StringIO()
    code = 0
    try:
        with redirect_stdout(buf):
            diff.main()
    except SystemExit as e:
        code = e.code
    finally:
        sys.argv = argv
    return buf.getvalue(), code


def test_bench_diff_zero_entry_and_loadavg_header(tmp_path):
    out, code = _run_diff(
        tmp_path,
        {"queries": {"a": 0.0, "b": 1.0}, "loadavg": [1.0, 1.0, 1.0]},
        {"queries": {"a": 0.5, "b": 2.0}, "loadavg": [2.0, 2.0, 2.0],
         "degraded": True},
    )
    # a 0.000 old entry must not crash; ratio uses the 1e-3 quantum
    assert "a" in out and "500.00" in out
    assert code == 1  # 500x > threshold
    # both loadavgs and the degraded stamp print above the table
    assert "loadavg=[1.0, 1.0, 1.0]" in out
    assert "DEGRADED" in out


def test_bench_diff_empty_shared_set(tmp_path):
    out, code = _run_diff(
        tmp_path,
        {"queries": {"a": 1.0}},
        {"queries": {"b": 1.0}},
    )
    assert "TOTAL" not in out  # skipped, not ZeroDivisionError
    assert "retired: a" in out and "new coverage: b" in out
    assert code == 0
