"""North-star sample-axis scaling: ms per PPI iteration vs batch size.

Same apparatus as bench.py (door-v0-class, H=160, SE-kernel prior + LBPS
update, megakernel rollout on TPU), swept over the sample count. The
roofline analysis (RESULTS.md) predicts near-flat latency until the VPU
lanes saturate — this measures where that happens and what sustained
env-substep throughput the chip reaches at the knee.

Usage: python studies/sample_scaling_northstar.py [N ...]
       (default sweep: 1024 4096 16384 65536)
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
WARMUP = 12   # tunneled-device warmup (see bench.py / RESULTS.md)
ITERS = 30

ns = [int(a) for a in sys.argv[1:]] or [1024, 4096, 16384, 65536]


def build(n_samples):
    from ppi_tpu.algorithms import make_solver
    from ppi_tpu.algorithms.base import _one_iteration
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
                                 block=min(1024, n_samples))
    else:
        f = mpc_objective(env, env_state)
    return jax.jit(_one_iteration(solver, family, f, n_samples)), policy


for n in ns:
    step, policy = build(n)
    key = jax.random.key(0)
    state = policy
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, (stats, _, costs) = step(state, sub)
    jax.block_until_ready(costs)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        state, (stats, _, costs) = step(state, sub)
    jax.block_until_ready(costs)
    ms = (time.perf_counter() - t0) / ITERS * 1e3

    # deployment-path variant: the same iteration under lax.scan (how the
    # MPC agent executes it — no per-iteration host dispatch; see
    # studies/northstar_scan_vs_host.py and the bench.py headline)
    @jax.jit
    def scanned(state, key, step=step):
        def body(carry, k):
            s, (st, _, c) = step(carry, k)
            return s, st["mean"]
        return jax.lax.scan(body, state, jax.random.split(key, ITERS))

    state2 = policy
    for i in range(3):
        state2, means = scanned(state2, jax.random.key(100 + i))
    jax.block_until_ready(means)
    t0 = time.perf_counter()
    for i in range(3):
        state2, means = scanned(state2, jax.random.key(200 + i))
    jax.block_until_ready(means)
    ms_scan = (time.perf_counter() - t0) / (3 * ITERS) * 1e3

    substeps = n * HORIZON * 2  # 2 physics substeps per env step
    print(json.dumps({
        "n_samples": n, "ms_per_iter": round(ms, 3),
        "ms_per_iter_in_scan": round(ms_scan, 3),
        "env_substeps_per_s": int(substeps / (ms_scan / 1e3)),
        "env_substeps_per_s_host_stepped": int(substeps / (ms / 1e3)),
        "backend": jax.default_backend(),
    }), flush=True)
