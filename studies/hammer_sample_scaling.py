"""Hammer-v0-hand sample-count scaling study (seeds 0-4, device).

Same protocol as tests/test_perf.py::test_canonical_mpc_nails_through_
grasped_hammer: HammerHand(soa), Lbps + SE kernel, H=30, T=400,
n_iters=2, anneal=0.5, 50 warm-start iters.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp

from ppi_tpu.algorithms import make_solver
from ppi_tpu.envs.hammer_hand import NAIL, HammerHand
from ppi_tpu.mpc import Mpc
from ppi_tpu.policies import design_moments, make_policy
from ppi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

n_samples = int(sys.argv[1])
delta = float(sys.argv[2])
seeds = [int(s) for s in sys.argv[3:]] or [0, 1, 2, 3, 4]

env = HammerHand(engine="soa", fixed_scene=True)  # the recorded
# study results are pinned to the nominal (legacy) scene
horizon = 30
mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
family, policy = make_policy(
    "SquaredExponentialKernel", env.dt * jnp.arange(horizon),
    env.action_dim, mean, ci, co, lengthscale=4 * env.dt,
    lower=env.action_low, upper=env.action_high)
agent = Mpc(env=env, solver=make_solver("Lbps", delta=delta),
            family=family, timesteps=400, horizon=horizon,
            n_samples=n_samples, n_iters=2, anneal=0.5)

results = []
for seed in seeds:
    t0 = time.perf_counter()
    carry = agent.init(policy, jax.random.key(seed))
    es = env.reset(jax.random.key(seed))
    carry, _ = agent.warm_start(carry, es, 50)
    carry, es, trace = agent.run_episode_scan(carry, es, collect=True)
    depth = float(es.physics.qpos[NAIL])
    success = bool(env.success(es))
    ret = float(trace["reward"].sum()) if trace is not None else float("nan")
    dt = time.perf_counter() - t0
    row = {"n_samples": n_samples, "delta": delta, "seed": seed,
           "success": success, "nail_depth": round(depth, 4),
           "return": round(ret, 1), "wall_s": round(dt, 1)}
    if trace is not None:
        a = trace["alpha"]
        e = trace["ess"]
        row["alpha_mean_first50"] = round(float(a[:50].mean()), 3)
        row["ess_frac_first50"] = round(float(e[:50].mean()) / n_samples, 4)
    results.append(row)
    print(json.dumps(row), flush=True)

n_ok = sum(r["success"] for r in results)
print(json.dumps({"n_samples": n_samples, "rate": f"{n_ok}/{len(results)}"}),
      flush=True)
