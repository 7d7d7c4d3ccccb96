"""compare_bench gate mechanics (round-11): the cumulative-drift rule
vs the round-(N−2) record must flag sub-2× creep the per-round ratio
gate cannot see, and --remeasure must refuse to re-price at a scale
factor other than the one the new bench doc records."""

from __future__ import annotations

import importlib.util
import json
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
TOOL = ROOT / "tools" / "compare_bench.py"


def _bench(path, queries, spread=None, sf=0.1):
    doc = {"metric": "t", "value": sum(queries.values()), "unit": "sec",
           "queries": queries, "spread": spread or {}, "sf": sf}
    path.write_text(json.dumps(doc))
    return str(path)


def _run(*argv):
    p = subprocess.run([sys.executable, str(TOOL), *argv],
                       capture_output=True, text=True)
    return p.returncode, p.stdout


def test_drift_gate_flags_sub2x_creep(tmp_path):
    """2.0 → 3.0 → 3.8 s: never 2× of the previous round, but 1.9× of
    two rounds back — the BPE-creep shape the round-10 verdict showed
    the dual-condition gate is blind to."""
    old2 = _bench(tmp_path / "r9.json", {"bpe": 2.0, "ok": 1.0},
                  {"bpe": 0.1, "ok": 0.1})
    old = _bench(tmp_path / "r10.json", {"bpe": 3.0, "ok": 1.0},
                 {"bpe": 0.1, "ok": 0.1})
    new = _bench(tmp_path / "r11.json", {"bpe": 3.8, "ok": 1.05},
                 {"bpe": 0.1, "ok": 0.1})
    code, out = _run(old, new)            # old gate alone: green
    assert code == 0 and "REGRESSED" not in out
    code, out = _run(old, new, "--drift-old", old2)
    assert code == 1
    assert "DRIFT bpe" in out and "ok" not in [
        line.split()[1].rstrip(":") for line in out.splitlines()
        if line.startswith(("DRIFT", "REGRESSED"))]


def test_drift_gate_respects_budget_and_spread(tmp_path):
    old2 = _bench(tmp_path / "r9.json", {"a": 2.0, "b": 2.0},
                  {"a": 0.1, "b": 2.5})
    old = _bench(tmp_path / "r10.json", {"a": 2.5, "b": 2.5})
    # a: 1.4x of two rounds back (under the 1.5 budget); b: 1.9x but
    # within b's own measured spread — both must stay green
    new = _bench(tmp_path / "r11.json", {"a": 2.8, "b": 3.9})
    code, out = _run(old, new, "--drift-old", old2)
    assert code == 0 and "DRIFT" not in out


def test_regressed_rows_not_double_flagged_as_drift(tmp_path):
    old2 = _bench(tmp_path / "r9.json", {"q": 1.0})
    old = _bench(tmp_path / "r10.json", {"q": 1.0})
    new = _bench(tmp_path / "r11.json", {"q": 9.0})
    code, out = _run(old, new, "--drift-old", old2)
    assert code == 1
    assert "REGRESSED q" in out and "DRIFT q" not in out


def _load_tool():
    spec = importlib.util.spec_from_file_location("compare_bench", TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_remeasure_sf_dir_derived_and_validated(monkeypatch):
    """round-10 advice (medium): a remeasure at the wrong scale factor
    would silently clear genuine regressions — derive sf_dir from the
    new doc's recorded sf and hard-error on an env mismatch."""
    cb = _load_tool()
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    assert cb._resolve_sf_dir(0.1) == "/root/testdata/sf0.1"
    assert cb._resolve_sf_dir("0.01") == "/root/testdata/sf0.01"
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    assert cb._resolve_sf_dir(0.1) == "/root/testdata/sf0.1"
    with pytest.raises(SystemExit):
        cb._resolve_sf_dir(0.01)          # env points at another scale
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    with pytest.raises(SystemExit):
        cb._resolve_sf_dir(None)          # nothing safe to derive from


def test_remeasure_sf_compares_numerically(monkeypatch):
    """round-11 advice (low): ``1`` vs ``1.0`` vs ``"0.10"`` are the
    SAME scale — string comparison used to hard-error on a numerically
    equal env dir, or derive a nonexistent path with no env."""
    cb = _load_tool()
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    assert cb._resolve_sf_dir("0.10") == "/root/testdata/sf0.1"
    assert cb._resolve_sf_dir(0.1) == "/root/testdata/sf0.1"
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    # normalized spelling matches the testdata layout (sf0.1, not sf0.10)
    assert cb._resolve_sf_dir("0.10") == "/root/testdata/sf0.1"
    assert cb._resolve_sf_dir(1.0) == "/root/testdata/sf1"
    with pytest.raises(SystemExit):
        cb._resolve_sf_dir("banana")      # unparseable sf still refuses


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_calibration_ratio_normalizes_box_speed(tmp_path):
    """Round-13: with --calibrate, a query that doubled on a box the
    calibration row shows is 2x slower is NOT a regression; the same
    numbers without --calibrate (or without calib fields) still flag.
    The ratio is printed either way when both docs carry calib."""
    old_doc = {"metric": "t", "value": 3.0, "unit": "sec", "sf": 0.1,
               "queries": {"q": 3.0}, "spread": {"q": 0.1},
               "calib": 1.0}
    new_doc = {"metric": "t", "value": 6.5, "unit": "sec", "sf": 0.1,
               "queries": {"q": 6.5}, "spread": {"q": 0.1},
               "calib": 2.0}
    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps(old_doc))
    new.write_text(json.dumps(new_doc))
    code, out = _run(str(old), str(new))
    assert code == 1 and "REGRESSED q" in out
    assert "box-speed ratio=2.000" in out
    code, out = _run(str(old), str(new), "--calibrate")
    assert code == 0 and "REGRESSED" not in out
    # --calibrate without calib fields refuses loudly
    uncal = tmp_path / "uncal.json"
    uncal.write_text(json.dumps(
        {"queries": {"q": 3.0}, "spread": {}, "sf": 0.1}))
    code, out = _run(str(uncal), str(new), "--calibrate")
    assert code != 0
