"""Mechanism-prediction test: ESSPS with the elite count scaled with N
pins the same RELATIVE ESS (~0.4 N, the profile LBPS selects at N=128),
so its weight profile is N-invariant — scaling samples should not
collapse into the all-seeds knock-away mode LBPS shows at N=512.
Same protocol otherwise: SE kernel, H=30, T=400, n_iters=2, anneal=0.5.
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
n_elites = int(sys.argv[2])
seeds = [int(s) for s in sys.argv[3:]] or [0, 1, 2, 3, 4]

env = HammerHand(engine="soa", fixed_scene=True)  # the recorded
# study results are pinned to the nominal (legacy) scene
horizon = 30
mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
family, policy = make_policy(
    "SquaredExponentialKernel", env.dt * jnp.arange(horizon),
    env.action_dim, mean, ci, co, lengthscale=4 * env.dt,
    lower=env.action_low, upper=env.action_high)
agent = Mpc(env=env, solver=make_solver("Essps", n_elites=n_elites),
            family=family, timesteps=400, horizon=horizon,
            n_samples=n_samples, n_iters=2, anneal=0.5)

results = []
for seed in seeds:
    t0 = time.perf_counter()
    carry = agent.init(policy, jax.random.key(seed))
    es = env.reset(jax.random.key(seed))
    carry, _ = agent.warm_start(carry, es, 50)
    carry, es, trace = agent.run_episode_scan(carry, es, collect=True)
    a = trace["alpha"]
    row = {"solver": f"Essps(n_elites={n_elites})", "n_samples": n_samples,
           "seed": seed, "success": bool(env.success(es)),
           "nail_depth": round(float(es.physics.qpos[NAIL]), 4),
           "return": round(float(trace["reward"].sum()), 1),
           "alpha_mean_first50": round(float(a[:50].mean()), 3),
           "wall_s": round(time.perf_counter() - t0, 1)}
    results.append(row)
    print(json.dumps(row), flush=True)

n_ok = sum(r["success"] for r in results)
print(json.dumps({"config": f"Essps({n_elites}) N={n_samples}",
                  "rate": f"{n_ok}/{len(results)}"}), flush=True)
