"""door-v0-adroit control-step latency breakdown (VERDICT r3 next #1's
"usable latency" criterion: <= 50 ms per control step at canonical N=64).

Measures, on device, at the canonical Lbps+SE config:
  - one stacked-engine substep (batch 64), isolated under lax.scan
  - one full H=30 rollout batch (64 x 30 x 4 substeps)
  - one full control step (2 solver iterations, as the agent runs it)
  - the episode rate from run_episode_scan (the deployment number)
plus the compile times of each program — the numbers that decide where
the optimization budget goes (substep op-count vs solver overhead).

Usage: python studies/adroit_latency.py [unroll] [out.json]
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

UNROLL = int(sys.argv[1]) if len(sys.argv) > 1 else 1
OUT = sys.argv[2] if len(sys.argv) > 2 else "results/perf/adroit_latency.json"
N = 64
REPS = 30


def timed_compile(fn, *args):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(*args)
    jax.block_until_ready(r)
    ms = 1e3 * (time.perf_counter() - t0) / REPS
    return compile_s, ms


def main():
    from ppi_tpu.envs.door_adroit import DoorAdroit
    from ppi_tpu.runners.goal_success import (CONFIGS,
                                              build_canonical_agent)

    env = DoorAdroit()
    es0 = env.reset(jax.random.key(0))
    rows = {}

    # 1. a single env.step batch (4 substeps) at batch 64
    @jax.jit
    def step_batch(states, actions):
        def one(s, a):
            s2, r = env.step(s, a)
            return s2.physics.qpos, r
        return jax.vmap(one)(states, actions)

    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape),
                          es0)
    actions = jnp.zeros((N, env.action_dim))
    c, ms = timed_compile(step_batch, states, actions)
    rows["env_step_batch64"] = dict(compile_s=round(c, 2),
                                    ms=round(ms, 3))

    # 2. full rollout batch: 64 plans x H=30 (the solver's objective eval)
    from ppi_tpu.envs.base import mpc_objective
    f = mpc_objective(env, es0, unroll=UNROLL)
    ff = jax.jit(lambda k, a: f(k, a))
    plans = jnp.zeros((N, 30, env.action_dim))
    c, ms = timed_compile(ff, jax.random.key(0), plans)
    rows["rollout_64x30"] = dict(compile_s=round(c, 2), ms=round(ms, 3),
                                 unroll=UNROLL)

    # 3. one full control step as the agent runs it
    cfg = dict(CONFIGS["door-v0-adroit"])
    cfg.pop("chunk", None)
    env2, agent, pol = build_canonical_agent("door-v0-adroit", cfg)
    carry = agent.init(pol, jax.random.key(0))

    @jax.jit
    def ctrl(carry, es):
        a, carry2, stats = agent.control_step(carry, es, jnp.zeros((), jnp.int32))
        return a, carry2
    c, ms = timed_compile(ctrl, carry, es0)
    rows["control_step_canonical"] = dict(compile_s=round(c, 2),
                                          ms=round(ms, 3))

    # 4. the megakernel path (r4): the same rollout and control step
    # through the whole-rollout Pallas kernel — the latency answer (the
    # XLA scan path pays per-fusion overhead x ~hundreds of small ops x
    # 4 substeps x H; the kernel keeps the batch in VMEM for the whole
    # horizon). TPU only (Mosaic).
    if jax.default_backend() == "tpu":
        from ppi_tpu.envs.physics.pallas_rollout import pallas_mpc_objective
        fp = pallas_mpc_objective(env, es0, 30, block=128)
        fpj = jax.jit(lambda k, a: fp(k, a))
        c, ms = timed_compile(fpj, jax.random.key(0), plans)
        rows["rollout_64x30_pallas"] = dict(compile_s=round(c, 2),
                                            ms=round(ms, 3))

        import dataclasses as _dc
        agent_p = _dc.replace(agent, use_pallas=True)
        @jax.jit
        def ctrl_p(carry, es):
            a, carry2, stats = agent_p.control_step(
                carry, es, jnp.zeros((), jnp.int32))
            return a, carry2
        c, ms = timed_compile(ctrl_p, carry, es0)
        rows["control_step_canonical_pallas"] = dict(compile_s=round(c, 2),
                                                     ms=round(ms, 3))

    payload = dict(backend=jax.default_backend(), n_samples=N,
                   unroll=UNROLL, rows=rows)
    print(json.dumps(payload, indent=1))
    out = pathlib.Path(OUT)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=2) + "\n")


if __name__ == "__main__":
    main()
