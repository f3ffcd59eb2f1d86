"""On-device scrambled Sobol sequences.

The reference samples QMC points host-side through ``scipy.stats.qmc.Sobol``
and maps them through ``erfinv`` (reference: ppi/samplers.py:25-40). On TPU
the generation itself must live in the compiled program, so we split the work:

  * host side (trace time, cached per dimension): the Sobol *direction
    numbers* — a (d, 32) uint32 table obtained from SciPy's Joe-Kuo tables.
  * device side: Gray-code construction of point ``i`` as the XOR-reduce of
    the direction numbers selected by the bits of ``gray(i)``, plus a random
    digital shift (XOR with per-dimension random bits) for scrambling, keyed
    by a JAX PRNG key so QMC draws thread through the usual key discipline.

The XOR-reduce over 30 bit-planes is a tiny fused integer loop on the VPU; the
erfinv Gaussian transform fuses into the same kernel.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_BITS = 30  # SciPy's Sobol tables are 30-bit


@lru_cache(maxsize=None)
def _direction_numbers(dim: int) -> np.ndarray:
    """(dim, _BITS) uint32 Sobol direction numbers (host-side, cached)."""
    from scipy.stats import qmc

    engine = qmc.Sobol(d=dim, scramble=False)
    return np.asarray(engine._sv, dtype=np.uint32)


@partial(jax.jit, static_argnames=("n", "dim"))
def sobol_uniform(key: jax.Array, n: int, dim: int) -> jnp.ndarray:
    """n scrambled-Sobol points in (0, 1)^dim.

    Uses the first power-of-two >= n points of the sequence (power-of-two
    batches preserve the digital-net balance; the reference rounds up the same
    way, reference: ppi/samplers.py:31) and returns the first n.
    """
    sv = jnp.asarray(_direction_numbers(dim))  # (dim, BITS) uint32
    idx = jnp.arange(n, dtype=jnp.uint32)
    gray = idx ^ (idx >> 1)
    # bit-plane selectors: (n, BITS) in {0, 1}
    bits = (gray[:, None] >> jnp.arange(_BITS, dtype=jnp.uint32)[None, :]) & 1
    # point_i = XOR over set bit-planes of the direction numbers.
    def body(carry, b):
        sel, plane = b  # sel: (n,), plane: (dim,)
        return carry ^ (sel[:, None] * plane[None, :]), None

    acc = jnp.zeros((n, dim), dtype=jnp.uint32)
    acc, _ = jax.lax.scan(body, acc, (bits.T, sv.T))
    # Owen-lite scrambling: random digital shift per dimension.
    shift = jax.random.bits(key, (1, dim), dtype=jnp.uint32) >> (32 - _BITS)
    acc = acc ^ shift
    # Map to (0, 1): add half-ulp offset so 0 never appears.
    return (acc.astype(jnp.float32) + 0.5) * (2.0 ** -_BITS)


def sobol_normal(key: jax.Array, n: int, dim: int, shrinkage: float = 0.9999):
    """Standard-normal scrambled-Sobol draws via the inverse CDF.

    The tiny shrinkage keeps erfinv off its poles, mirroring the reference's
    guard (reference: ppi/samplers.py:32-34).
    """
    u = sobol_uniform(key, n, dim)
    u = 0.5 + shrinkage * (u - 0.5)
    return jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * u - 1.0)
