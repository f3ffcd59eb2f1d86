"""MPC profiling harness.

Counterpart of the reference's profiler (reference: profile_mpc.py): times
seconds per MPC control step for n_samples in {16, 128, 1024} across
solver x policy combinations — MPPI/iCEM/LBPS x SE-kernel/white/coloured —
on the on-device env zoo. Unlike the reference (which printed only), results
are emitted as JSON for regression tracking.

    python -m ppi_tpu.runners.profile_mpc --env door-v0 --runs 10
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ppi_tpu.algorithms import make_solver
from ppi_tpu.mpc import Mpc
from ppi_tpu.policies import design_moments, make_policy

HORIZON = 30
TIMESTEPS = 250


def build_env(name):
    from ppi_tpu.runners.run_mpc import ENVS  # single registry of envs
    return ENVS[name]()


def profile_one(env, policy_name, solver_name, n_samples, runs,
                solver_kwargs=None):
    mean, ci, co = design_moments(env.action_low, env.action_high,
                                  ratio=1000.0)
    kw = dict(lower=env.action_low, upper=env.action_high)
    if policy_name == "SquaredExponentialKernel":
        kw["lengthscale"] = 0.05
    fam, pol = make_policy(policy_name, env.dt * jnp.arange(HORIZON),
                           env.action_dim, mean, ci, co, **kw)
    solver = make_solver(solver_name, **(solver_kwargs or {}))
    agent = Mpc(env=env, solver=solver, family=fam, timesteps=TIMESTEPS,
                horizon=HORIZON, n_samples=n_samples)
    carry = agent.init(pol, jax.random.key(0))
    es = env.reset(jax.random.key(1))
    # compile + force completion (a host fetch, not just block_until_ready —
    # remote backends can return from block early)
    action, carry, _ = agent.control_step(carry, es, jnp.asarray(0))
    _ = float(action.sum())
    t0 = time.perf_counter()
    for i in range(runs):
        action, carry, _ = agent.control_step(carry, es, jnp.asarray(i % 8))
    _ = float(action.sum())
    # steady-state pipelined time per control step (the MPC loop is a
    # sequential chain, so device time dominates; one sync at the end)
    return (time.perf_counter() - t0) / runs


def main(args):
    env = build_env(args.env)
    combos = [
        ("Mppi", "WhiteNoiseIid", dict(alpha=10.0)),
        ("Mppi", "SquaredExponentialKernel", dict(alpha=10.0)),
        ("iCem", "ColouredNoise", dict(n_elites=10)),
        ("Lbps", "SquaredExponentialKernel", dict(delta=0.1)),
    ]
    results = {"env": args.env, "backend": jax.default_backend(),
               "horizon": HORIZON, "timings_s": {}}
    for n_samples in args.n_samples:
        for solver_name, policy_name, kw in combos:
            sec = profile_one(env, policy_name, solver_name, n_samples,
                              args.runs, kw)
            key = f"{solver_name}/{policy_name}/n={n_samples}"
            results["timings_s"][key] = round(sec, 5)
            print(f"{key}: {sec*1e3:.2f} ms/control-step", flush=True)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="door-v0")
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--n-samples", type=int, nargs="+",
                   default=[16, 128, 1024])
    main(p.parse_args())
