"""The diagnostic scripts must keep working against the live fixtures —
they are the first thing a session runs."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_testdata_canary_passes_on_current_fixtures():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "testdata_check.py")],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "match the supported contract" in out.stdout


def test_testdata_canary_detects_drift(tmp_path):
    # a root with a missing table and a wrong-typed column must fail loud
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = tmp_path / "sf9"
    sf.mkdir()
    pq.write_table(
        pa.table({"r_regionkey": pa.array([1.5], type=pa.float64()),
                  "r_name": ["x"]}),
        sf / "region.parquet",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "testdata_check.py"),
         "--root", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 1
    assert "DRIFT" in out.stdout
    assert "region.r_regionkey" in out.stdout      # wrong type reported
    assert "lineitem: MISSING" in out.stdout       # absent table reported


def test_rotation_report_flags_unchecked_entries():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "rotation_report.py")],
        capture_output=True, text=True, timeout=300, cwd=ROOT,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "registry: " in out.stdout
    # every never-driver-checked entry must either sit INSIDE the first-50
    # window (OK line: it gets a row next round) or be flagged for
    # rotation (ACTION line) — never silently unchecked at 51+
    assert ("ACTION: rotate these into the first 50" in out.stdout
            or "OK: these get their first driver row next round"
            in out.stdout
            or "never driver-checked: 0" in out.stdout)
