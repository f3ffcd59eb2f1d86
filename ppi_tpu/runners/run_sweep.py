"""Experiment-grid driver over the native sweep executor.

Builds the canonical experiment grid (algorithms x seeds for a runner) and
executes it through ``native/ppi-sweep`` (bounded process pool, per-job logs,
retries, JSONL summary) — the production replacement for the reference's
Makefile-driven sweeps.

    python -m ppi_tpu.runners.run_sweep --runner opt --seeds 3 -j 2 \
        --dir results/sweep
"""

import argparse
import sys
from pathlib import Path

from ppi_tpu.utils.sweep import run_sweep

GRIDS = {
    "opt": [
        "{py} -m ppi_tpu.runners.run_opt {alg} NoisySphere --dimension 20 "
        "--seed {seed} --dir {dir} mc --n-samples 100",
        ["Reps", "Mppi", "Lbps", "Essps", "Cem"],
    ],
    "policy-search": [
        "{py} -m ppi_tpu.runners.run_policy_search {alg} BallInACup "
        "RbfFeatures --epsilon 2.0 --n-iters 40 --seed {seed} --dir {dir} "
        "MonteCarlo --n-samples 128",
        ["Reps", "Essps", "Lbps"],
    ],
    "mpc": [
        "{py} -m ppi_tpu.runners.run_mpc {alg} door-v0 "
        "SquaredExponentialKernel --delta 0.9 --anneal 0.5 "
        "--lengthscale 0.08 --alpha 5.0 --seed {seed} --no-plots "
        "--dir {dir} MonteCarlo --n-samples 64",
        ["Lbps", "Mppi"],
    ],
}


def main(args):
    template, algorithms = GRIDS[args.runner]
    out = Path(args.dir)
    out.mkdir(parents=True, exist_ok=True)
    commands = [
        template.format(py=sys.executable, alg=alg, seed=seed, dir=out)
        for alg in algorithms for seed in range(args.seeds)
    ]
    rows, code = run_sweep(commands, n_workers=args.jobs,
                           retries=args.retries, workdir=out,
                           logdir=out / "logs")
    ok = sum(1 for r in rows if r["exit"] == 0)
    print(f"sweep: {ok}/{len(rows)} jobs succeeded "
          f"(summary: {out / 'sweep_summary.jsonl'})")
    return code


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runner", choices=sorted(GRIDS), default="opt")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--jobs", "-j", type=int, default=2)
    p.add_argument("--retries", type=int, default=1)
    p.add_argument("--dir", default="results/sweep")
    raise SystemExit(main(p.parse_args()))
