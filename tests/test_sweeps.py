"""Subprocess-level CLI + multirun tests (reference tests/test_sweeps.py parity:
run the real ``python src/train.py`` command line, including ``-m`` sweeps).
"""

import pytest

# slow tier: subprocess multirun/sweep drives (run with `pytest -m slow`)
pytestmark = pytest.mark.slow

import json
import subprocess
import sys
from pathlib import Path


REPO_ROOT = Path(__file__).resolve().parent.parent


def run_cli(args, tmp_path, timeout=560):
    cmd = [
        sys.executable,
        str(REPO_ROOT / "src" / "train.py"),
        "experiment=smoke_synthetic",
        f"data.data_dir={tmp_path}/synthetic",
        f"paths.log_dir={tmp_path}/logs",
        "logger=csv",
        "extras.print_config=false",
        "extras.enforce_tags=false",
        *args,
    ]
    return subprocess.run(
        cmd, cwd=REPO_ROOT, capture_output=True, text=True, timeout=timeout
    )


def test_cli_fast_dev_run(tmp_path):
    res = run_cli(["trainer.fast_dev_run=true", "test=false"], tmp_path)
    assert res.returncode == 0, res.stderr[-2000:]
    runs = list((tmp_path / "logs" / "smoke_synthetic").glob("runs/*")) or list(
        (tmp_path / "logs").glob("*/runs/*")
    )
    assert runs, "no run output directory created"


def test_cli_multirun_sweep(tmp_path):
    res = run_cli(
        ["-m", "seed=1,2", "trainer.fast_dev_run=true", "test=false"], tmp_path
    )
    assert res.returncode == 0, res.stderr[-2000:]
    jobs = list((tmp_path / "logs").glob("*/multiruns/*/*"))
    assert len(jobs) == 2, f"expected 2 multirun jobs, found {jobs}"


def test_cli_composition_error_is_clear(tmp_path):
    res = run_cli(["model=does_not_exist"], tmp_path, timeout=120)
    assert res.returncode != 0
    assert "does_not_exist" in (res.stderr + res.stdout)
