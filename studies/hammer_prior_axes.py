"""Hammer-v0-hand prior/horizon axes study (seeds 0-4, device).

The sample-scaling study (hammer_sample_scaling.py) showed N is not a
robustness lever under relative-temperature selection; this sweeps the
axes that study did NOT: planning horizon, prior lengthscale, and anneal.
Same base protocol as tests/test_perf.py: HammerHand(soa), Lbps + SE
kernel, T=400, n_iters=2, 50 warm-start iters, N=128.

Usage: python studies/hammer_prior_axes.py <horizon> <ls_mult> <anneal> \
           [seeds...]
  ls_mult: lengthscale = ls_mult * env.dt (baseline 4)
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ppi_tpu.algorithms import make_solver
from ppi_tpu.envs.hammer_hand import NAIL, HammerHand
from ppi_tpu.mpc import Mpc
from ppi_tpu.policies import design_moments, make_policy
from ppi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

horizon = int(sys.argv[1])
ls_mult = float(sys.argv[2])
anneal = float(sys.argv[3])
seeds = [int(s) for s in sys.argv[4:]] or [0, 1, 2, 3, 4]
n_samples = 128

env = HammerHand(engine="soa", fixed_scene=True)  # the recorded
# study results are pinned to the nominal (legacy) scene
mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
family, policy = make_policy(
    "SquaredExponentialKernel", env.dt * jnp.arange(horizon),
    env.action_dim, mean, ci, co, lengthscale=ls_mult * env.dt,
    lower=env.action_low, upper=env.action_high)
agent = Mpc(env=env, solver=make_solver("Lbps", delta=0.9),
            family=family, timesteps=400, horizon=horizon,
            n_samples=n_samples, n_iters=2, anneal=anneal)

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
    row = {"horizon": horizon, "ls_mult": ls_mult, "anneal": anneal,
           "seed": seed, "success": success, "nail_depth": round(depth, 4),
           "return": round(ret, 1), "wall_s": round(dt, 1)}
    results.append(row)
    print(json.dumps(row), flush=True)

n_ok = sum(r["success"] for r in results)
print(json.dumps({"horizon": horizon, "ls_mult": ls_mult, "anneal": anneal,
                  "rate": f"{n_ok}/{len(results)}"}), flush=True)
