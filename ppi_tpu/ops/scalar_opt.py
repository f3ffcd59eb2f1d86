"""In-graph scalar optimization for temperature selection.

The reference leans on SciPy for every 1-D/2-D temperature search: L-BFGS-B
for the REPS dual (reference: ppi/algorithms.py:205-212), Brent for the LBPS
lower bound and the ESSPS ESS match (reference: ppi/algorithms.py:559-564,
608-613). Those are host-side, sequential, and un-jittable. The TPU-native
replacement is:

  * ``grid_golden_min`` — evaluate the objective on a log-spaced grid *in one
    vectorized call* (a single VPU sweep — effectively free next to a rollout
    batch), bracket the minimum, then polish with fixed-iteration
    golden-section. Works for any unimodal/quasiconvex objective, which all
    the PPI duals are in practice.
  * ``bisect_decreasing`` — fixed-iteration bisection for monotone root
    finding (the ESS(alpha) match).

Everything uses static iteration counts so the search lives inside the jitted
update with no host round-trips.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

# Same search interval as the reference's temperature bounds
# (reference: ppi/algorithms.py:36-37).
ALPHA_LOWER = 1e-5
ALPHA_UPPER = 5e2

_INV_PHI = 0.6180339887498949  # 1/golden ratio


def golden_section_min(
    fn: Callable, lo, hi, iters: int = 40, log_space: bool = True
):
    """Golden-section minimization of a unimodal scalar function on [lo, hi].

    With ``log_space`` the search runs in log-x (natural for temperatures
    spanning [1e-5, 5e2]). 40 iterations shrink the bracket by ~1e-8x.
    """
    tf = jnp.log if log_space else (lambda x: x)
    itf = jnp.exp if log_space else (lambda x: x)
    a, b = tf(jnp.asarray(lo, jnp.float32)), tf(jnp.asarray(hi, jnp.float32))

    c = b - _INV_PHI * (b - a)
    d = a + _INV_PHI * (b - a)

    def body(_, carry):
        a, b, c, d, fc, fd = carry
        shrink_right = fc < fd
        a = jnp.where(shrink_right, a, c)
        b = jnp.where(shrink_right, d, b)
        c_new = b - _INV_PHI * (b - a)
        d_new = a + _INV_PHI * (b - a)
        # Reuse the surviving interior evaluation; evaluate only the new point.
        f_known = jnp.where(shrink_right, fc, fd)
        f_new = fn(itf(jnp.where(shrink_right, c_new, d_new)))
        fc = jnp.where(shrink_right, f_new, f_known)
        fd = jnp.where(shrink_right, f_known, f_new)
        return a, b, c_new, d_new, fc, fd

    init = (a, b, c, d, fn(itf(c)), fn(itf(d)))
    a, b, *_ = jax.lax.fori_loop(0, iters, body, init)
    return itf(0.5 * (a + b))


def grid_golden_min(
    fn: Callable,
    lo: float = ALPHA_LOWER,
    hi: float = ALPHA_UPPER,
    n_grid: int = 64,
    refine_iters: int = 32,
    log_space: bool = True,
):
    """Global-ish scalar minimization: vectorized grid sweep + local polish.

    ``fn`` must map a scalar (or vector, broadcasting over the last axis) to
    objective values; the grid evaluation calls it once on an (n_grid,) vector
    so the sweep is a single fused VPU pass.
    """
    if log_space:
        xs = jnp.logspace(jnp.log10(lo), jnp.log10(hi), n_grid)
    else:
        xs = jnp.linspace(lo, hi, n_grid)
    ys = jax.vmap(fn)(xs)
    i = jnp.argmin(ys)
    # Bracket = the two grid cells around the best point.
    lo_b = xs[jnp.maximum(i - 1, 0)]
    hi_b = xs[jnp.minimum(i + 1, n_grid - 1)]
    return golden_section_min(fn, lo_b, hi_b, iters=refine_iters, log_space=log_space)


def grid_zoom_min(
    fn: Callable,
    lo: float = ALPHA_LOWER,
    hi: float = ALPHA_UPPER,
    n_grid: int = 64,
    zooms: int = 2,
    zoom_points: int = 33,
    log_space: bool = True,
):
    """Latency-optimal scalar minimization: iterated *vectorized* grid zoom.

    ``grid_golden_min``'s golden polish is 32 *sequential* objective
    evaluations — on TPU each is a separate tiny kernel in the critical
    path, which dominates the whole Gibbs-posterior update's latency
    (measured: the LBPS update is ~1.7 ms of the 5 ms north-star
    iteration, mostly this chain). Zooming instead re-grids the
    2-cell bracket around the argmin: each zoom is ONE batched
    evaluation (vmap over the candidate vector), so the search costs
    1 + ``zooms`` sequential passes instead of 1 + 32. Resolution after
    the default 64 + 2x33 sweep over [1e-5, 5e2] is ~0.1% in alpha —
    far inside the temperature's sensitivity for any of the PPI duals
    (the posterior weights change at O(alpha * cost-range) and the duals
    are flat at their minimum).
    """
    tf = jnp.log if log_space else (lambda x: x)
    itf = jnp.exp if log_space else (lambda x: x)
    a = tf(jnp.asarray(lo, jnp.float32))
    b = tf(jnp.asarray(hi, jnp.float32))
    best = None
    for n in (n_grid,) + (zoom_points,) * zooms:
        xs = jnp.linspace(a, b, n)
        ys = jax.vmap(lambda t: fn(itf(t)))(xs)
        i = jnp.argmin(ys)
        cell = (b - a) / (n - 1)
        best = xs[i]
        a = jnp.maximum(best - cell, tf(jnp.asarray(lo, jnp.float32)))
        b = jnp.minimum(best + cell, tf(jnp.asarray(hi, jnp.float32)))
    return itf(best)


def grid_zoom_root_decreasing(
    fn: Callable,
    target,
    lo: float = ALPHA_LOWER,
    hi: float = ALPHA_UPPER,
    n_grid: int = 64,
    zooms: int = 2,
    zoom_points: int = 33,
    log_space: bool = True,
):
    """Root finding for monotonically decreasing ``fn`` by iterated
    vectorized grid zoom — the latency-optimal replacement for
    ``bisect_decreasing``'s 50 sequential evaluations (same rationale as
    ``grid_zoom_min``; used for the ESSPS ESS(alpha) match). Clamps to
    the interval when the target is outside the attained range, matching
    the bisection's behavior."""
    tf = jnp.log if log_space else (lambda x: x)
    itf = jnp.exp if log_space else (lambda x: x)
    a = tf(jnp.asarray(lo, jnp.float32))
    b = tf(jnp.asarray(hi, jnp.float32))
    for n in (n_grid,) + (zoom_points,) * zooms:
        xs = jnp.linspace(a, b, n)
        ys = jax.vmap(lambda t: fn(itf(t)))(xs)
        # decreasing: the root sits in the last cell whose left edge is
        # still above target
        i = jnp.clip(jnp.sum(ys > target) - 1, 0, n - 2)
        a, b = xs[i], xs[i + 1]
    return itf(0.5 * (a + b))


@partial(jax.jit, static_argnames=("fn", "iters", "log_space"))
def bisect_decreasing(
    fn: Callable,
    target,
    lo: float = ALPHA_LOWER,
    hi: float = ALPHA_UPPER,
    iters: int = 50,
    log_space: bool = True,
):
    """Solve fn(x) = target for fn monotonically *decreasing* in x on [lo, hi].

    Used for the ESSPS temperature: ESS(alpha) falls monotonically from N
    towards 1 as alpha grows. Clamps to the interval if the target is outside
    the attained range.
    """
    tf = jnp.log if log_space else (lambda x: x)
    itf = jnp.exp if log_space else (lambda x: x)
    a, b = tf(jnp.asarray(lo, jnp.float32)), tf(jnp.asarray(hi, jnp.float32))

    def body(_, carry):
        a, b = carry
        m = 0.5 * (a + b)
        above = fn(itf(m)) > target  # still above target -> move right
        a = jnp.where(above, m, a)
        b = jnp.where(above, b, m)
        return a, b

    a, b = jax.lax.fori_loop(0, iters, body, (a, b))
    return itf(0.5 * (a + b))


def minimize_newton(fn: Callable, x0: jnp.ndarray, iters: int = 25,
                    damping: float = 1e-6):
    """Fixed-iteration damped Newton minimization for tiny smooth problems
    (e.g. the 2-parameter MORE dual). Backtracks over 4 step sizes per
    iteration, evaluated in parallel; keeps the first improving candidate.

    Replaces the reference's SciPy L-BFGS-B on the MORE dual (reference:
    ppi/algorithms.py:398-404) with an in-graph solver.
    """
    grad_fn = jax.grad(fn)
    hess_fn = jax.hessian(fn)
    d = x0.shape[0]
    newton_steps = jnp.array([1.0, 0.5, 0.1])
    gd_steps = jnp.array([1.0, 0.3, 0.1, 0.03, 0.01])

    def body(_, carry):
        x, fx = carry
        g = grad_fn(x)
        h = hess_fn(x)
        # Regularize an indefinite Hessian far enough that the Newton step is
        # bounded; gradient-descent candidates cover the remaining cases.
        evals = jnp.linalg.eigvalsh(0.5 * (h + h.T))
        lam = jnp.maximum(damping, -1.5 * jnp.min(evals))
        direction = jnp.linalg.solve(h + lam * jnp.eye(d), g)
        direction = jnp.where(jnp.all(jnp.isfinite(direction)), direction, g)
        cands = jnp.concatenate([
            x[None, :] - newton_steps[:, None] * direction[None, :],
            x[None, :] - gd_steps[:, None] * g[None, :],
        ])
        fvals = jax.vmap(fn)(cands)
        fvals = jnp.where(jnp.isfinite(fvals), fvals, jnp.inf)
        best = jnp.argmin(fvals)
        improved = fvals[best] < fx
        x_new = jnp.where(improved, cands[best], x)
        f_new = jnp.where(improved, fvals[best], fx)
        return x_new, f_new

    x, fx = jax.lax.fori_loop(0, iters, body, (x0, fn(x0)))
    return x, fx
