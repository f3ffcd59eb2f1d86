"""Python interface to the native sweep executor.

``ppi-sweep`` (native/sweep_runner.cpp) is the runtime piece that replaces
the reference's Makefile-driven experiment sweeps (reference: Makefile:8-21):
a C++ process-pool executor with per-job logs, retries, JSONL summaries and
clean SIGINT teardown. This module builds it on demand and exposes
``run_sweep`` for programmatic use.
"""

import json
import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
BINARY = NATIVE_DIR / "ppi-sweep"


def build_native(force: bool = False) -> Path:
    """Compile the sweep executor if needed; returns the binary path."""
    if BINARY.exists() and not force:
        return BINARY
    subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                   capture_output=True)
    return BINARY


def run_sweep(commands, n_workers: int = 0, retries: int = 0,
              workdir: Path = None, logdir: Path = None):
    """Run a list of shell commands through the native executor.

    Returns the parsed summary: a list of dicts with id/cmd/exit/seconds.
    """
    binary = build_native()
    workdir = Path(workdir or ".")
    spec = workdir / "sweep_spec.txt"
    summary = workdir / "sweep_summary.jsonl"
    spec.write_text("\n".join(commands) + "\n")
    args = [str(binary), str(spec), "-o", str(summary)]
    if n_workers:
        args += ["-j", str(n_workers)]
    if retries:
        args += ["-r", str(retries)]
    if logdir:
        args += ["-l", str(logdir)]
    proc = subprocess.run(args)
    rows = [json.loads(l) for l in summary.read_text().splitlines() if l]
    rows.sort(key=lambda r: r["id"])
    return rows, proc.returncode
