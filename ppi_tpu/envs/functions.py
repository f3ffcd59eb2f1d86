"""Analytic test functions for black-box optimization benchmarks.

Counterpart of the optimization benchmark suite (reference:
optimization/functions.py:21-104): batched (N, d) -> (N,) cost maps with known
optima, used as the physics-free bring-up path for the whole solver stack.

Contract: every function is ``f(key, x) -> costs``; deterministic functions
ignore the key (a uniform signature keeps the solve loop monomorphic).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Himmelblau:
    """Negated Himmelblau (2-D, four global optima at cost ~ -0)."""

    dim: int = 2
    f_opt = 0.0

    def __call__(self, key, x):
        a = x[:, 0] ** 2 + x[:, 1] - 11.0
        b = x[:, 0] + x[:, 1] ** 2 - 7.0
        return -(a * a + b * b) - self.f_opt


@dataclasses.dataclass(frozen=True)
class Rosenbrock:
    dim: int = 2
    f_opt = 0.0

    @property
    def x_opt(self):
        return np.ones((self.dim,))

    def __call__(self, key, x):
        head, tail = x[:, :-1], x[:, 1:]
        return jnp.sum(100.0 * (tail - head ** 2) ** 2 + (1.0 - head) ** 2,
                       axis=-1) - self.f_opt


@dataclasses.dataclass(frozen=True)
class Styblinski:
    dim: int = 2

    @property
    def x_opt(self):
        return -2.903534 * np.ones((self.dim,))

    @property
    def f_opt(self):
        return -39.16599 * self.dim

    def __call__(self, key, x):
        return (0.5 * jnp.sum(x ** 4 - 16.0 * x ** 2 + 5.0 * x, axis=-1)
                - self.f_opt)


@dataclasses.dataclass(frozen=True)
class Rastrigin:
    dim: int = 2
    f_opt = 0.0
    amplitude = 10.0

    @property
    def x_opt(self):
        return np.zeros((self.dim,))

    def __call__(self, key, x):
        return (self.amplitude * self.dim
                + jnp.sum(x ** 2 - self.amplitude
                          * jnp.cos(2.0 * jnp.pi * x), axis=-1) - self.f_opt)


@dataclasses.dataclass(frozen=True)
class NoisySphere:
    """Random PSD quadratic with Gaussian evaluation noise
    (reference: optimization/functions.py:86-104)."""

    dim: int = 2
    seed: int = 0
    noise_std: float = 0.01
    f_opt = 0.0

    @property
    def quadratic(self):
        rng = np.random.default_rng(self.seed)
        chol = rng.standard_normal((self.dim, self.dim))
        return jnp.asarray(chol @ chol.T, jnp.float32)

    @property
    def x_opt(self):
        return np.zeros((self.dim,))

    def __call__(self, key, x):
        noise = self.noise_std * jax.random.normal(key, (x.shape[0],))
        quad = jnp.einsum("bi,ij,bj->b", x, self.quadratic, x)
        return quad + noise - self.f_opt


FUNCTIONS = {
    "Himmelblau": Himmelblau,
    "Rosenbrock": Rosenbrock,
    "Rastrigin": Rastrigin,
    "Styblinski": Styblinski,
    "NoisySphere": NoisySphere,
}


def make_function(name: str, dim: int, **kwargs):
    return FUNCTIONS[name](dim=dim, **kwargs)
