"""CLI end-to-end smoke (subprocess, as the reference tests its CLI:
/root/reference/tests/test_cli_e2e.py:21-60)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "data_model_ray", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=500,
    )


class TestCli:
    def test_run_info_validate(self, tmp_path):
        out = str(tmp_path / "pyr")
        r = run_cli("run", "--rows", "2000", "--out", out, "--cpus", "4")
        assert r.returncode == 0, r.stderr[-2000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["input_rows"] == 2000
        assert summary["cells"] > 0
        assert summary["levels"][0]["level"] == 7

        i = run_cli("info", "--out", out)
        assert i.returncode == 0
        manifest = json.loads(i.stdout)
        assert manifest["kind"] == "geocell-pyramid"

        v = run_cli("validate", "--out", out)
        assert v.returncode == 0, v.stdout
        assert json.loads(v.stdout.strip())["is_valid"] is True

    def test_validate_detects_missing(self, tmp_path):
        v = run_cli("validate", "--out", str(tmp_path / "nothing"))
        assert v.returncode == 1
