"""Mesh + megakernel composition bench (VERDICT r3 next #3's bench row).

Measures the north-star PPI iteration (door-v0-class, H=160, SE prior +
LBPS) at 16k+ samples through `sharded_pallas_mpc_objective` — the round-4
composition of the whole-rollout Pallas megakernel with a sample-axis
device mesh — against the unsharded megakernel and the sharded XLA-scan
path on the same device set.

On the single-chip CI host the mesh is 1 device: the study then certifies
that the shard_map wrapping adds no measurable overhead over the plain
megakernel (the multi-device speedup itself is validated functionally by
the 8-virtual-device CPU mesh tests + the driver's multichip dryrun, and
the collective cost model is the same all-reduce the vmap mesh path
already measured). On a real pod slice, run with more devices for the
scaling row.

Usage: python studies/mesh_megakernel_bench.py [n_samples] [out.json]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
OUT = sys.argv[2] if len(sys.argv) > 2 else "results/perf/mesh_megakernel.json"
HORIZON = 160
ITERS = 30


def build(mode):
    from ppi_tpu.algorithms import make_solver
    from ppi_tpu.algorithms.base import _one_iteration
    from ppi_tpu.envs.base import mpc_objective
    from ppi_tpu.envs.door import Door
    from ppi_tpu.parallel.mesh import make_mesh, sharded_mpc_objective
    from ppi_tpu.policies import design_moments, make_policy

    env = Door()
    mean, cov_in, cov_out = design_moments(env.action_low, env.action_high,
                                           ratio=1000.0)
    family, policy = make_policy(
        "SquaredExponentialKernel", env.dt * jnp.arange(HORIZON),
        env.action_dim, mean, cov_in, cov_out, lengthscale=4 * env.dt,
        lower=env.action_low, upper=env.action_high)
    solver = make_solver("Lbps", delta=0.9)
    state0 = env.reset(jax.random.key(0))
    n_dev = len(jax.devices())
    if mode == "megakernel":
        from ppi_tpu.envs.physics.pallas_rollout import pallas_mpc_objective
        f = pallas_mpc_objective(env, state0, HORIZON,
                                 block=min(1024, N))
    elif mode == "mesh+megakernel":
        from ppi_tpu.envs.physics.pallas_rollout import (
            sharded_pallas_mpc_objective)
        mesh = make_mesh(n_dev)
        f = sharded_pallas_mpc_objective(env, state0, HORIZON, mesh,
                                         block=min(1024, N // n_dev))
    elif mode == "mesh+scan":
        mesh = make_mesh(n_dev)
        f = sharded_mpc_objective(env, state0, mesh)
    else:
        f = mpc_objective(env, state0)
    step = jax.jit(_one_iteration(solver, family, f, N))
    return step, policy


def measure(mode):
    step, policy = build(mode)

    @jax.jit
    def scanned(state, key):
        def body(carry, k):
            s, (st, _, c) = step(carry, k)
            return s, st["mean"]
        return jax.lax.scan(body, state, jax.random.split(key, ITERS))

    state = policy
    for i in range(3):
        state, means = scanned(state, jax.random.key(100 + i))
    jax.block_until_ready(means)
    t0 = time.perf_counter()
    for i in range(3):
        state, means = scanned(state, jax.random.key(200 + i))
    jax.block_until_ready(means)
    ms = 1e3 * (time.perf_counter() - t0) / (3 * ITERS)
    return ms, float(means[-1])


if __name__ == "__main__":
    rows = {}
    for mode in ("megakernel", "mesh+megakernel", "mesh+scan"):
        try:
            ms, mean_cost = measure(mode)
        except Exception as e:  # interpret-mode CPU or kernel unavailable
            print(f"{mode}: unavailable ({e!r})")
            continue
        rows[mode] = dict(ms_per_iter=round(ms, 3), mean_cost=round(
            mean_cost, 2), substeps_per_sec=round(N * HORIZON / ms * 1e3))
        print(f"{mode}: {ms:.3f} ms/iter at N={N} "
              f"({rows[mode]['substeps_per_sec']:,} substeps/s)")
    payload = dict(n_samples=N, horizon=HORIZON,
                   n_devices=len(jax.devices()),
                   backend=jax.default_backend(), rows=rows)
    out = pathlib.Path(OUT)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=2) + "\n")
    print(f"wrote {out}")
