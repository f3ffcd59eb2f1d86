"""Pallas TPU kernels for the hot posterior-update ops.

``m_projection_pallas`` fuses the whole weighted moment match — weight
exponentiation/normalization, weighted first/second moments and the ESS
statistics — into ONE kernel pass over the sample axis: the (d, N) x (N, d)
second-moment contraction runs on the MXU from VMEM-resident tiles while the
weight math rides along on the VPU, instead of XLA's separate
normalize / subtract / matmul kernels each re-reading the batch from HBM.

Single-pass formulation (shift by max(log_w) for stability):
    w_i  = exp(log_w_i - max)            W  = sum w        W2 = sum w^2
    S1   = sum w_i x_i                   S2 = sum w_i x_i x_i^T
    mu   = S1 / W      sigma = S2 / W - mu mu^T      ess = W^2 / W2

Used automatically by ops.m_projection for large batches on TPU; the lax
path remains the oracle (tests compare the two, and the kernel runs in
interpreter mode on CPU).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_N = 256


def _mm_kernel(logw_ref, x_ref, centre_ref, shift_ref, s1_ref, s2_ref,
               wsum_ref):
    """Accumulate one sample tile into the moment buffers. Samples are
    centred by a batch-mean estimate inside the kernel, so the single-pass
    E[xx^T] - mu mu^T identity runs on residuals (no catastrophic
    cancellation when |mu| >> std)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)
        wsum_ref[:] = jnp.zeros_like(wsum_ref)

    w = jnp.exp(logw_ref[:] - shift_ref[0, 0])          # (tile, 1)
    x = x_ref[:] - centre_ref[:]                         # (tile, d)
    xw = x * w                                           # fused on the VPU
    # MXU: (d, tile) @ (tile, d)
    s2_ref[:] += jnp.dot(xw.T, x, preferred_element_type=jnp.float32)
    s1_ref[:] += jnp.sum(xw, axis=0, keepdims=True)
    wsum_ref[:] += jnp.stack([jnp.sum(w), jnp.sum(w * w)]).reshape(1, 2)


@partial(jax.jit, static_argnames=("tile_n", "interpret"))
def m_projection_pallas(log_w: jnp.ndarray, samples: jnp.ndarray,
                        tile_n: int = DEFAULT_TILE_N,
                        interpret: bool = False):
    """Weighted Gaussian moment match (mu, sigma, ess) — fused TPU kernel.

    log_w: (N,) unnormalized log-weights (may contain -inf); samples: (N, d).
    N must not be smaller than the tile; the caller pads otherwise.
    """
    n, d = samples.shape
    tile = min(tile_n, n)
    pad = (-n) % tile
    if pad:
        # padded lanes get -inf log-weight: exactly zero contribution
        log_w = jnp.concatenate([log_w, jnp.full((pad,), -jnp.inf,
                                                 log_w.dtype)])
        samples = jnp.concatenate(
            [samples, jnp.zeros((pad, d), samples.dtype)])
        n = n + pad
    shift = jnp.max(log_w).reshape(1, 1).astype(jnp.float32)
    log_w2 = log_w.reshape(n, 1).astype(jnp.float32)
    samples = samples.astype(jnp.float32)
    centre = jnp.mean(samples, axis=0, keepdims=True)

    grid = (n // tile,)
    s1, s2, wsum = pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        interpret=interpret,
    )(log_w2, samples, centre, shift)

    w_total, w_sq = wsum[0, 0], wsum[0, 1]
    mu_c = s1[0] / w_total
    sigma = s2 / w_total - jnp.outer(mu_c, mu_c)
    sigma = 0.5 * (sigma + sigma.T)
    ess = w_total * w_total / w_sq
    return mu_c + centre[0], sigma, ess
