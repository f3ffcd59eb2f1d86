"""Native runtime components: the C++ sweep executor builds and runs."""

import shutil
import subprocess
from pathlib import Path

import pytest

from ppi_tpu.utils.sweep import build_native, run_sweep

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


class TestSweepRunner:
    def test_builds(self):
        binary = build_native()
        assert binary.exists()

    def test_runs_parallel_sweep(self, tmp_path):
        rows, code = run_sweep(
            ["echo one", "echo two", "sh -c 'exit 3'", "echo four"],
            n_workers=2, workdir=tmp_path, logdir=tmp_path / "logs")
        assert code == 1  # one job failed
        assert len(rows) == 4
        by_id = {r["id"]: r for r in rows}
        assert by_id[0]["exit"] == 0
        assert by_id[2]["exit"] == 3
        assert all(r["seconds"] >= 0 for r in rows)
        # per-job logs captured
        log = (tmp_path / "logs" / "job_0_attempt1.log").read_text()
        assert "one" in log

    def test_retries_flaky_job(self, tmp_path):
        marker = tmp_path / "marker"
        # fails on first attempt (no marker), succeeds on second
        cmd = (f"sh -c 'if [ -f {marker} ]; then exit 0; "
               f"else touch {marker}; exit 1; fi'")
        rows, code = run_sweep([cmd], retries=1, workdir=tmp_path)
        assert code == 0
        assert rows[0]["attempts"] == 2
