"""Gaussian and matrix-normal divergences and entropies.

Counterparts of the reference's closed-form expressions (reference:
ppi/policies.py:146-231) using ``slogdet`` (numerically stabler than
``log(det(.))`` with an EPS clamp) and triangular solves.
"""

import jax.numpy as jnp


def vec(x: jnp.ndarray) -> jnp.ndarray:
    """Column-major (Fortran) vectorization of a matrix, or batch thereof.

    (reference: ppi/policies.py:161-171)
    """
    if x.ndim == 3:
        b = x.shape[0]
        return jnp.transpose(x, (0, 2, 1)).reshape(b, -1)
    return jnp.transpose(x).reshape(-1, 1)


def _slogdet(a: jnp.ndarray) -> jnp.ndarray:
    sign, logdet = jnp.linalg.slogdet(a)
    del sign
    return logdet


def multivariate_gaussian_kl(mu_1, sigma_1, mu_2, sigma_2) -> jnp.ndarray:
    """KL( N(mu_1, sigma_1) || N(mu_2, sigma_2) )."""
    d = sigma_1.shape[0]
    diff = mu_2 - mu_1
    return 0.5 * (
        _slogdet(sigma_2)
        - _slogdet(sigma_1)
        + jnp.trace(jnp.linalg.solve(sigma_2, sigma_1))
        + diff @ jnp.linalg.solve(sigma_2, diff)
        - d
    )


def multivariate_gaussian_entropy(sigma, d: int) -> jnp.ndarray:
    return 0.5 * _slogdet(sigma) + (d / 2.0) * (1.0 + jnp.log(2.0 * jnp.pi))


def matrix_gaussian_kl(
    mean_1, cov_in_1, cov_out_1, mean_2, cov_in_2, cov_out_2
) -> jnp.ndarray:
    """KL between matrix normals MN(M, U, V).

    The U/V factorization is only defined up to a scale, so both operands are
    first normalized to trace(V) = p for numerical robustness — matching the
    scale-invariant treatment of the reference (ppi/policies.py:186-192).
    """
    n, p = mean_1.shape
    diff = mean_2 - mean_1
    sf1 = p / jnp.trace(cov_out_1)
    sf2 = p / jnp.trace(cov_out_2)
    cov_out_1 = cov_out_1 * sf1
    cov_out_2 = cov_out_2 * sf2
    cov_in_1 = cov_in_1 / sf1
    cov_in_2 = cov_in_2 / sf2
    # trace(kron(A, B)) = trace(A) trace(B): no need to materialize the kron.
    tr_kron = jnp.trace(jnp.linalg.solve(cov_out_2, cov_out_1)) * jnp.trace(
        jnp.linalg.solve(cov_in_2, cov_in_1)
    )
    maha = jnp.sum(diff * jnp.linalg.solve(cov_in_2, jnp.linalg.solve(cov_out_2, diff.T).T))
    return 0.5 * (
        n * _slogdet(cov_out_2)
        - n * _slogdet(cov_out_1)
        + p * _slogdet(cov_in_2)
        - p * _slogdet(cov_in_1)
        + tr_kron
        + maha
        - n * p
    )


def matrix_normal_entropy(covariance_in, covariance_out, d_in: int, d_out: int):
    """Entropy of MN(., U, V), trace-normalizing V to keep the two logdets in
    range (the factorization scale cancels in the sum; reference:
    ppi/policies.py:219-231)."""
    sf = d_out / jnp.trace(covariance_out)
    logdet_in = d_out * _slogdet(covariance_in / sf)
    logdet_out = d_in * _slogdet(sf * covariance_out)
    return 0.5 * (logdet_in + logdet_out) + (d_in * d_out / 2.0) * (
        1.0 + jnp.log(2.0 * jnp.pi)
    )
