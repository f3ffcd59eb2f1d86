"""Host-stepped vs in-graph (lax.scan) iteration timing for the north star.

bench.py steps `_one_iteration` from the host (async dispatch pipelines the
30 calls, so host overhead mostly overlaps device compute); the MPC agent's
deployment path runs all n_iters under one `lax.scan` inside the jitted
control step (`solve_scan`). This study measures both on the same workload
to quantify the residual per-call host overhead — if the scan amortization
is material, the honest bench number is still the host-stepped one (it is
what a fresh iteration costs), but the deployment story should cite the
scan number.

Usage: python studies/northstar_scan_vs_host.py [n_iters_per_scan]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ppi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

WARMUP = 12
ITERS = 30
SCAN_LEN = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def main():
    import bench
    from ppi_tpu.algorithms.base import _one_iteration  # noqa: F401

    step, policy = bench.build()

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
    ms_host = (time.perf_counter() - t0) / ITERS * 1e3

    # the same iteration under one lax.scan of SCAN_LEN steps
    @jax.jit
    def scanned(state, key):
        def body(carry, k):
            s, (st, _, c) = step(carry, k)
            return s, st["mean"]
        keys = jax.random.split(key, SCAN_LEN)
        return jax.lax.scan(body, state, keys)

    state2 = policy
    for i in range(3):
        state2, means = scanned(state2, jax.random.key(100 + i))
    jax.block_until_ready(means)
    t0 = time.perf_counter()
    reps = max(1, ITERS // SCAN_LEN * 3)
    for i in range(reps):
        state2, means = scanned(state2, jax.random.key(200 + i))
    jax.block_until_ready(means)
    ms_scan = (time.perf_counter() - t0) / (reps * SCAN_LEN) * 1e3

    print(json.dumps({
        "backend": jax.default_backend(),
        "scan_len": SCAN_LEN,
        "ms_per_iter_host_stepped": round(ms_host, 3),
        "ms_per_iter_in_scan": round(ms_scan, 3),
        "host_overhead_ms": round(ms_host - ms_scan, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
