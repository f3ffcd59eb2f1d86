"""Measure megakernel rollout time vs block size at awkward batch sizes."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp

from ppi_tpu.envs.door import Door
from ppi_tpu.envs.physics.pallas_rollout import pallas_mpc_objective
from ppi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

env = Door()
H = 160
es = env.reset(jax.random.key(0))

for n in (1408, 1100):
    for block in (128, 256, 512, 1024):
        f = jax.jit(pallas_mpc_objective(env, es, H, block=block))
        acts = 0.1 * jax.random.normal(jax.random.key(1), (n, H, env.action_dim))
        for _ in range(12):
            out = f(jax.random.key(0), acts)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(jax.random.key(0), acts)
        jax.block_until_ready(out)
        ms = 1e3 * (time.perf_counter() - t0) / 20
        print(f"n={n} block={block:5d} grid={-(-n // block):2d} "
              f"rollout={ms:.3f} ms", flush=True)
