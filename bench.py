"""North-star benchmark: one full PPI iteration on the door-v0-class task —
1024 sampled GP action plans rolled out in parallel over H=160 contact-rich
physics steps, plus the Gibbs-posterior (matrix-normal moment-match) update.

Target (BASELINE.json): < 100 ms per PPI iteration on TPU v5e. The reference
does the same workload as 1024 x 160 native MuJoCo steps over a CPU process
pool with per-sample pickle round trips.

Prints ONE JSON line:
  {"metric": ..., "value": <ms per PPI iteration>, "unit": "ms",
   "vs_baseline": <target_ms / measured_ms; > 1 beats the 100 ms target>}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

N_SAMPLES = 1024
HORIZON = 160
TARGET_MS = 100.0
WARMUP = 12  # the first ~10 post-compile executions in a fresh process
#              run up to 10x slow on the tunneled device (see RESULTS.md)
ITERS = 30  # ~0.1 s of measurement; the tunneled chip shows ~+/-0.5 ms
#             run-to-run variance at 10 iters, ~halved at 30


def build():
    from ppi_tpu.algorithms import make_solver
    from ppi_tpu.algorithms.base import _one_iteration
    from ppi_tpu.envs.base import mpc_objective
    from ppi_tpu.envs.door import Door
    from ppi_tpu.policies import design_moments, make_policy

    env = Door()
    mean, cov_in, cov_out = design_moments(env.action_low, env.action_high,
                                           ratio=1000.0)
    family, policy = make_policy(
        "SquaredExponentialKernel", env.dt * jnp.arange(HORIZON),
        env.action_dim, mean, cov_in, cov_out, lengthscale=4 * env.dt,
        lower=env.action_low, upper=env.action_high)
    solver = make_solver("Lbps", delta=0.9)
    env_state = env.reset(jax.random.key(0))
    if jax.default_backend() != "cpu":
        # whole-rollout Pallas megakernel: measured ~10-20% faster than the
        # scan path on v5e and 2.5x faster to compile (see RESULTS.md);
        # fall back to the XLA scan path if the kernel fails to build
        try:
            from ppi_tpu.envs.physics.pallas_rollout import (
                pallas_mpc_objective)
            f = pallas_mpc_objective(env, env_state, HORIZON,
                                     block=min(1024, N_SAMPLES))
            jax.jit(f)(jax.random.key(0), jnp.zeros(
                (N_SAMPLES, HORIZON, env.action_dim))).block_until_ready()
        except Exception as e:  # pragma: no cover - TPU-runtime dependent
            print(f"# pallas rollout unavailable ({e!r}); "
                  "using the XLA scan path", file=sys.stderr)
            f = mpc_objective(env, env_state)
    else:
        f = mpc_objective(env, env_state)
    step = jax.jit(_one_iteration(solver, family, f, N_SAMPLES))
    return step, policy


def main():
    step, policy = build()
    key = jax.random.key(0)
    state = policy
    # warmup (compile)
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        state, (stats, _, costs) = step(state, sub)
    jax.block_until_ready(costs)

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, sub = jax.random.split(key)
        state, (stats, _, costs) = step(state, sub)
    jax.block_until_ready(costs)
    elapsed = time.perf_counter() - t0
    ms_host_stepped = 1e3 * elapsed / ITERS

    # Deployment-path measurement: the MPC agent runs all solver iterations
    # inside ONE jitted control step (mpc/agent.py solve_scan; whole episodes
    # go under run_episode_scan), so per-iteration host dispatch is not part
    # of the framework's execution model. Measured on the tunneled chip, the
    # host-stepped loop above pays ~1.3 ms/call of dispatch latency that the
    # in-graph path does not (studies/northstar_scan_vs_host.py: 2.0 ms
    # host-stepped vs 0.72 ms in-scan, stable across runs).
    @jax.jit
    def scanned(state, key):
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
    elapsed_scan = time.perf_counter() - t0
    ms_per_iter = 1e3 * elapsed_scan / (3 * ITERS)

    env_steps_per_sec = N_SAMPLES * HORIZON * 3 * ITERS / elapsed_scan
    print(f"# backend={jax.default_backend()} "
          f"env_steps/s={env_steps_per_sec:,.0f} "
          f"mean_cost={float(stats['mean']):.2f} "
          f"host_stepped_ms={ms_host_stepped:.3f}", file=sys.stderr)
    print(json.dumps({
        "metric": ("ms per PPI iteration (door-v0-class, 1024 rollouts, "
                   "H=160, SE-kernel prior + LBPS update; iterations "
                   "in-graph as the MPC agent runs them)"),
        "value": round(ms_per_iter, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms_per_iter, 3),
        "value_host_stepped": round(ms_host_stepped, 3),
    }))


if __name__ == "__main__":
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    main()
