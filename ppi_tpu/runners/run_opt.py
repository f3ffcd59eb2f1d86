"""Black-box optimization runner.

CLI-parity counterpart of the reference's optimization entry point
(reference: optimization/run_opt.py): positional algorithm + function,
sampler subcommand (mc / qmc / quad) carrying --n-samples, exists-guarded
result directory, npz trace dump and optional plots.

Canonical config (reference Makefile:8-9):
    python -m ppi_tpu.runners.run_opt Reps NoisySphere --dimension 20 mc \
        --n-samples 100
"""

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.algorithms import ALGORITHMS, make_solver, solve_scan
from ppi_tpu.envs.functions import FUNCTIONS, make_function
from ppi_tpu.policies.gaussian import Gaussian
from ppi_tpu.samplers import BY_NAME as SAMPLER_NAMES
from ppi_tpu.utils import experiment_dir, save_results, setup_logging, write_args
from ppi_tpu import viz

SAMPLER_CHOICES = ["mc", "qmc", "quad", "MonteCarlo", "QuasiMonteCarlo",
                   "CubatureQuadrature"]


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("algorithm", choices=sorted(ALGORITHMS))
    parser.add_argument("function", choices=sorted(FUNCTIONS))
    parser.add_argument("--dimension", type=int, default=5)
    parser.add_argument("--n-iter", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--name", type=str, default="")
    parser.add_argument("--dir", type=str, default=None)
    parser.add_argument("--force", action="store_true",
                        help="rerun even if results exist")
    # algorithm hyperparameters (union; each solver takes what it declares)
    parser.add_argument("--n-elites", type=int, default=10)
    parser.add_argument("--alpha", type=float, default=0.9)
    parser.add_argument("--base-entropy", type=float, default=-100.0)
    parser.add_argument("--entropy-rate", type=float, default=0.99)
    parser.add_argument("--epsilon", type=float, default=0.1)
    parser.add_argument("--delta", type=float, default=0.5)
    parser.add_argument("--mesh-devices", type=int, default=0,
                        help="shard the sample axis over this many devices "
                             "(0 = single-device vmap)")

    sub = parser.add_subparsers(title="sampling", dest="sampling",
                                required=True)
    for samp in SAMPLER_CHOICES:
        sp = sub.add_parser(samp)
        sp.add_argument("--n-samples", type=int, default=100)
    return parser


def main(args):
    filepath = None
    if args.dir is not None:
        name = (f"{args.algorithm}_{args.function}_{args.sampling}_"
                f"{args.seed}_{args.name}")
        filepath = experiment_dir(Path(args.dir), name, args.force)
        if filepath is None:
            print("experiment done!")
            return None
        write_args(args, filepath)
    setup_logging(filepath, args)

    function = make_function(args.function, args.dimension, seed=args.seed)
    if getattr(args, "mesh_devices", 0):
        from ppi_tpu.parallel import make_mesh, sharded_objective
        function = sharded_objective(function, make_mesh(args.mesh_devices))
    # iCEM reuses elites through the Particles sampler (MC + injection),
    # mirroring run_mpc.py's wiring of the same solver.
    use_particles = args.algorithm == "iCem"
    sampler = (SAMPLER_NAMES["Particles"] if use_particles
               else SAMPLER_NAMES[args.sampling])
    dim = args.dimension
    family = Gaussian(dim=dim, sampler=sampler,
                      diagonal=args.algorithm == "Cem",
                      max_particles=max(1, int(0.33 * args.n_elites)))
    # canonical prior: mu = 1, Sigma = 0.5 I (reference: run_opt.py:57-62)
    state = family.init(jnp.ones(dim), 0.5 * jnp.eye(dim))
    solver = make_solver(
        args.algorithm, n_elites=args.n_elites, alpha=args.alpha,
        epsilon=args.epsilon, delta=args.delta, dimension=dim,
        base_entropy=args.base_entropy, entropy_rate=args.entropy_rate)

    n_samples = (2 * dim if args.sampling in ("quad", "CubatureQuadrature")
                 else args.n_samples)
    state, trace = solve_scan(solver, family, state, function,
                              jax.random.key(args.seed), n_samples,
                              args.n_iter)
    trace = {k: np.asarray(v) for k, v in trace.items()}
    logging.info("final cost %.5g (from %.5g), |mu - x_opt| = %.4g",
                 trace["mean"][-1], trace["mean"][0],
                 float(np.linalg.norm(np.asarray(state.mu)
                                      - getattr(function, "x_opt", 0.0))))

    if filepath is not None:
        trace["episodes"] = n_samples * np.arange(args.n_iter)
        save_results(filepath, **trace)
    if args.plot:
        viz.plot_algorithm_result(
            trace, filepath / "result" if filepath else None,
            label=args.algorithm)
    return state, trace


if __name__ == "__main__":
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    main(build_parser().parse_args())
