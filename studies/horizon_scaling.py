"""Long-horizon scaling study: one PPI iteration (sample + synthetic cost +
LBPS update) vs horizon H per policy family, N=1024, d_a=4, on device.

Isolates the policy/update path from physics: the cost is a fused
quadratic, so the measured time is sampling (incl. the H x H or m x m
Cholesky work), the weight/temperature search, and the moment match.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp

from ppi_tpu.algorithms import make_solver
from ppi_tpu.algorithms.base import _one_iteration
from ppi_tpu.policies import design_moments, make_policy
from ppi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 1024
D = 4
low, high = -jnp.ones(D), jnp.ones(D)
solver = make_solver("Lbps", delta=0.9)


def cost_fn(key, actions):
    t = jnp.linspace(0.0, 1.0, actions.shape[1])[None, :, None]
    target = jnp.sin(2 * jnp.pi * t) * jnp.ones((1, 1, actions.shape[2]))
    c = jnp.sum((actions - target) ** 2, axis=(1, 2))
    return c + 0.1 * jax.random.normal(key, (actions.shape[0],))


FAMILIES = [
    ("SquaredExponentialKernel", dict(lengthscale=0.1)),
    ("Matern32Kernel", dict(lengthscale=0.1)),
    ("RffFeatures", dict(lengthscale=0.1, n_features=32)),
    ("RbfFeatures", dict(lengthscale=0.1, n_features=32)),
    ("LinearGaussianDynamicalSystemKernel", dict(order=2)),
    ("WhiteNoiseIid", dict()),
]

for name, kw in FAMILIES:
    for H in (160, 320, 640, 1280):
        t_seq = (1.0 / H) * jnp.arange(H)
        mean, ci, co = design_moments(low, high, 1000.0)
        try:
            family, policy = make_policy(name, t_seq, D, mean, ci, co,
                                         lower=low, upper=high, **kw)
            step = jax.jit(_one_iteration(solver, family, cost_fn, N))
            key = jax.random.key(0)
            state = policy
            t0 = time.perf_counter()
            for _ in range(12):
                key, sub = jax.random.split(key)
                state, (_, _, costs) = step(state, sub)
            jax.block_until_ready(costs)
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(10):
                key, sub = jax.random.split(key)
                state, (_, _, costs) = step(state, sub)
            jax.block_until_ready(costs)
            ms = 1e3 * (time.perf_counter() - t0) / 10
            print(f"{name:38s} H={H:5d} iter={ms:8.2f} ms "
                  f"(warm+compile {warm:.1f} s) cost={float(costs.mean()):.1f}",
                  flush=True)
        except Exception as e:
            print(f"{name:38s} H={H:5d} FAILED: {type(e).__name__}: {e}",
                  flush=True)
