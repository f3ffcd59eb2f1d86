"""Pure-JAX math layer: weighting, moment matching, divergences, PSD guards,
in-graph scalar optimization, QMC and noise generation.

Counterpart of the reference's math-in-NumPy layer (reference:
ppi/policies.py:40-231, ppi/algorithms.py duals) rebuilt as jit-safe,
batched device code.
"""

from ppi_tpu.ops.weighting import (
    normalize_log_weights,
    effective_sample_size,
    log_weight_stats,
    weight_entropy,
    select_row,
)
from ppi_tpu.ops.moment_match import m_projection, m_projection_mavn
from ppi_tpu.ops.divergences import (
    multivariate_gaussian_kl,
    multivariate_gaussian_entropy,
    matrix_gaussian_kl,
    matrix_normal_entropy,
    vec,
)
from ppi_tpu.ops.psd import (
    symmetric,
    factorized,
    safe_cholesky,
    cholesky_or_fallback,
    psd_floor,
)
from ppi_tpu.ops.scalar_opt import (
    golden_section_min,
    grid_golden_min,
    grid_zoom_min,
    grid_zoom_root_decreasing,
    bisect_decreasing,
)

__all__ = [
    "normalize_log_weights",
    "effective_sample_size",
    "log_weight_stats",
    "weight_entropy",
    "m_projection",
    "m_projection_mavn",
    "multivariate_gaussian_kl",
    "multivariate_gaussian_entropy",
    "matrix_gaussian_kl",
    "matrix_normal_entropy",
    "vec",
    "symmetric",
    "factorized",
    "safe_cholesky",
    "cholesky_or_fallback",
    "psd_floor",
    "golden_section_min",
    "grid_golden_min",
    "grid_zoom_min",
    "grid_zoom_root_decreasing",
    "bisect_decreasing",
]
