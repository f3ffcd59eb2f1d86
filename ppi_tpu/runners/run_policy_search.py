"""Episodic policy search runner.

CLI-parity counterpart of the reference's policy-search entry point
(reference: policy_search/run_policy_search.py): positional algorithm + env +
policy, sampler subcommand, the canonical RBF prior hyperparameters, initial
conditioning on action_0, success-rate tracking, npz results.

Canonical config (reference Makefile:11-12):
    python -m ppi_tpu.runners.run_policy_search Reps BallInACup RbfFeatures \
        --epsilon 2.0 --n-iters 40 MonteCarlo --n-samples 128
"""

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu import viz
from ppi_tpu.algorithms import ALGORITHMS, make_solver, solve
from ppi_tpu.envs.episodic import EPISODIC_ENVS
from ppi_tpu.policies import POLICY_NAMES, make_policy
from ppi_tpu.samplers import BY_NAME as SAMPLER_NAMES
from ppi_tpu.utils import experiment_dir, save_results, setup_logging, write_args


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("algorithm", choices=sorted(ALGORITHMS))
    parser.add_argument("env", choices=sorted(EPISODIC_ENVS))
    parser.add_argument("policy", choices=POLICY_NAMES)
    parser.add_argument("--n-iters", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dir", type=str, default=None)
    parser.add_argument("--name", type=str, default="")
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--render", action="store_true",
                        help="save a GIF of the learned mean trajectory "
                             "(BallInACup)")
    parser.add_argument("--n-string-particles", type=int, default=0,
                        help="override the BiC string resolution (0 = env "
                             "default; fidelity studies)")
    parser.add_argument("--track-diagnostics", action="store_true",
                        help="compute matrix-normal entropy/KL telemetry "
                             "(the reference disables these by commenting "
                             "out; here it is a flag)")
    parser.add_argument("--checkpoint-every", type=int, default=0,
                        help="save (policy, key, iteration) every N iters")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the checkpoint in --dir")
    # algorithm hyperparameters
    parser.add_argument("--n-elites", type=int, default=10)
    parser.add_argument("--alpha", type=float, default=0.9)
    parser.add_argument("--base-entropy", type=float, default=-100.0)
    parser.add_argument("--entropy-rate", type=float, default=0.99)
    parser.add_argument("--epsilon", type=float, default=1.0)
    parser.add_argument("--delta", type=float, default=1.0)
    parser.add_argument("--mesh-devices", type=int, default=0,
                        help="shard the sample (trajectory) axis over this "
                             "many devices (0 = single-device vmap)")

    sub = parser.add_subparsers(title="sampling", dest="sampling",
                                required=True)
    for samp in sorted(set(SAMPLER_NAMES)):
        sp = sub.add_parser(samp)
        sp.add_argument("--n-samples", type=int, default=10)
    return parser


def main(args):
    filepath = None
    if args.dir is not None:
        name = (f"{args.algorithm}_{args.env}_{args.policy}_{args.sampling}_"
                f"{args.seed}_{args.name}")
        filepath = experiment_dir(Path(args.dir), name, args.force)
        if filepath is None:
            print("experiment done!")
            return None
        write_args(args, filepath)
    setup_logging(filepath, args)

    env = EPISODIC_ENVS[args.env]()
    if args.n_string_particles and args.env == "BallInACup":
        from ppi_tpu.envs.ball_in_a_cup import BallInCupSim
        object.__setattr__(env, "sim",
                           BallInCupSim(n_particles=args.n_string_particles))
        logging.info("BiC string resolution: %d particles",
                     args.n_string_particles)
    # canonical prior hyperparameters (reference: run_policy_search.py:62-74)
    family, policy = make_policy(
        args.policy, env.t, env.dim_action, env.action_0,
        covariance_in=jnp.array([1e2]),
        covariance_out=jnp.diag(jnp.array([1e-3] * env.dim_action)),
        lengthscale=float(np.sqrt(3e-2)), n_features=20, order=10,
        sampler=args.sampling, use_derivatives=True, add_bias=True,
        track_entropy=args.track_diagnostics)
    if env.condition:
        policy = family.condition(policy, jnp.zeros(1), env.action_0[None, :])

    solver = make_solver(args.algorithm, alpha=args.alpha,
                         epsilon=args.epsilon, delta=args.delta,
                         n_elites=args.n_elites, base_entropy=-200.0,
                         entropy_rate=0.99, dimension=family.dim_features)

    key = jax.random.key(args.seed)
    ckpt_path = (filepath / "checkpoint.npz") if filepath else None
    start_iter = 0
    if args.resume and ckpt_path is not None and ckpt_path.exists():
        from ppi_tpu.utils import load_checkpoint
        (policy, key), start_iter = load_checkpoint(ckpt_path, (policy, key))
        logging.info("resumed from %s at iteration %d", ckpt_path, start_iter)

    def callback(i, f, actions, costs, state):
        logging.info("iter %d: cost %.3f +/- %.3f",
                     i, float(jnp.mean(costs)), float(jnp.std(costs)))
        if (args.checkpoint_every and ckpt_path is not None
                and (i + 1) % args.checkpoint_every == 0):
            from ppi_tpu.utils import save_checkpoint
            save_checkpoint(ckpt_path, (state, key), step=start_iter + i + 1)
        return False

    objective = env.objective()
    if getattr(args, "mesh_devices", 0):
        from ppi_tpu.parallel import make_mesh, sharded_objective
        objective = sharded_objective(objective,
                                      make_mesh(args.mesh_devices))
    policy, trace = solve(solver, family, policy, objective,
                          key, args.n_samples,
                          args.n_iters - start_iter, callback=callback)
    success_rate = [float(v) for v in np.asarray(trace["success_rate"])]
    logging.info("Success rate history: %s", success_rate)

    trace = {k: np.asarray(v) for k, v in trace.items()}
    if filepath is not None:
        trace["episodes"] = args.n_samples * np.arange(args.n_iters)
        trace["success_rate"] = np.asarray(success_rate)
        save_results(filepath, **trace)
    if args.render and args.env == "BallInACup":
        from ppi_tpu.render import render_ball_in_a_cup, trace_bic_trajectory
        mean_actions = family.predict_mean(policy)
        if family.use_derivatives:
            dfeat = family.dfeat(policy, policy.t)
            dxs = dfeat @ policy.mean
            mean_actions = jnp.concatenate([mean_actions, dxs], axis=-1)
        qs, qds = env.map_actions_to_joints(mean_actions[None])
        qh, ph, final = trace_bic_trajectory(env.sim, env.q_start,
                                             qs[0], qds[0])
        out = (filepath / "ball_in_a_cup.gif") if filepath else             Path("ball_in_a_cup.gif")
        render_ball_in_a_cup(env.sim, qh, ph, out, stride=8)
        r, success = env.sim.reward_and_success(final)
        logging.info("rendered mean trajectory -> %s (success=%s)",
                     out, bool(success))

    if args.plot and filepath is not None:
        viz.plot_algorithm_result(trace, filepath / "result",
                                  label=args.algorithm)
        actions, _ = family.sample(policy, jax.random.key(1), 16)
        viz.plot_policy_samples(np.asarray(actions)[..., :env.dim_action],
                                filepath / "policy_samples")
    return policy, trace, success_rate


if __name__ == "__main__":
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    main(build_parser().parse_args())
