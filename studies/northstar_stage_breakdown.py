"""Per-stage latency breakdown of the north-star PPI iteration.

Round 2 measured (on the 5.1 ms iteration): sampling 1.53 ms + megakernel
rollout 1.83 ms + LBPS update 1.75 ms, which motivated the vectorized
grid-zoom temperature search (RESULTS.md). This harness re-measures the
three stages under the current code so perf work targets the real
bottleneck rather than the round-2 snapshot.

Stages are jitted *separately*, so the sum carries three host dispatches
while the full iteration carries one — the full-iteration number is the
truth, the stages are the map. Caveat (memory: isolation benchmarks lie):
XLA cannot fuse across these boundaries, so stage sums exceeding the
fused iteration indicate fusion wins, not measurement error.

Usage: python studies/northstar_stage_breakdown.py [n_samples]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ppi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

HORIZON = 160
WARMUP = 12
ITERS = 30

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def timeit(fn, *args):
    out = None
    for _ in range(WARMUP):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from ppi_tpu.algorithms import make_solver
    from ppi_tpu.algorithms.base import Batch, _one_iteration, mask_costs
    from ppi_tpu.envs.base import mpc_objective
    from ppi_tpu.envs.door import Door
    from ppi_tpu.policies import design_moments, make_policy

    env = Door()
    mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
    family, policy = make_policy(
        "SquaredExponentialKernel", env.dt * jnp.arange(HORIZON),
        env.action_dim, mean, ci, co, lengthscale=4 * env.dt,
        lower=env.action_low, upper=env.action_high)
    solver = make_solver("Lbps", delta=0.9)
    env_state = env.reset(jax.random.key(0))
    if jax.default_backend() != "cpu":
        from ppi_tpu.envs.physics.pallas_rollout import pallas_mpc_objective
        f = pallas_mpc_objective(env, env_state, HORIZON,
                                 block=min(1024, N))
    else:
        f = mpc_objective(env, env_state)

    key = jax.random.key(0)

    # stage 1: prior sampling (base draw + matrix-normal transform + clip)
    @jax.jit
    def sample(state, key):
        return family.sample(state, key, N)

    actions, params = sample(policy, key)
    ms_sample = timeit(sample, policy, key)

    # stage 2: rollout megakernel (costs only)
    roll = jax.jit(lambda k, a: f(k, a))
    costs = roll(key, actions)
    costs = costs[0] if isinstance(costs, tuple) else costs
    ms_roll = timeit(roll, key, actions)

    # stage 3: LBPS temperature search + matrix-normal moment match
    @jax.jit
    def update(state, costs, params):
        c, valid, log_valid = mask_costs(costs)
        return solver.update(family, state, Batch(c, params, valid,
                                                  log_valid))
    ms_update = timeit(update, policy, costs, params)

    # the fused full iteration (what bench.py measures)
    step = jax.jit(_one_iteration(solver, family, f, N))
    state = policy
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, (stats, _, c) = step(state, sub)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, (stats, _, c) = step(state, sub)
    jax.block_until_ready(c)
    ms_full = (time.perf_counter() - t0) / ITERS * 1e3

    print(json.dumps({
        "n_samples": N, "backend": jax.default_backend(),
        "ms_sample": round(ms_sample, 3), "ms_rollout": round(ms_roll, 3),
        "ms_update": round(ms_update, 3),
        "ms_stage_sum": round(ms_sample + ms_roll + ms_update, 3),
        "ms_full_iteration": round(ms_full, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
