"""Optimizer base loop: sample -> evaluate -> mask -> Gibbs-posterior update.

Counterpart of ``Base.__call__`` / ``Base.filter`` (reference:
ppi/algorithms.py:40-98) with the TPU-native control flow:

  * the whole iteration is one jitted program; ``solve_scan`` runs all
    iterations under ``lax.scan`` and returns the telemetry trace as stacked
    arrays (the reference's trace-dict-of-lists, but allocated once);
  * NaN costs from diverged rollouts are handled by *masking*, not
    compaction: invalid lanes get ``-inf`` log-weight so they carry exactly
    zero posterior mass (static shapes; a bad lane can't poison the batch);
    if ALL lanes are invalid, costs are zeroed and the update proceeds
    vacuously, matching the reference's degenerate-batch behavior
    (reference: ppi/algorithms.py:57-68);
  * ``solve`` is the host-driven variant with callback/early-stop parity.
"""

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class Batch(NamedTuple):
    """One evaluated sample batch, after NaN masking."""

    costs: jnp.ndarray      # (N,) cleaned costs (invalid lanes zeroed)
    params: jnp.ndarray     # (N, ...) policy-space samples
    valid: jnp.ndarray      # (N,) bool mask
    log_valid: jnp.ndarray  # (N,) 0 / -inf additive mask for log-weights


def mask_costs(costs: jnp.ndarray) -> tuple:
    """NaN/Inf filter as a mask (reference Base.filter, algorithms.py:57-68)."""
    valid = jnp.isfinite(costs)
    none_valid = ~jnp.any(valid)
    costs_clean = jnp.where(valid, costs, 0.0)
    # all-invalid batch: zero costs, treat every lane as valid (vacuous update)
    costs_clean = jnp.where(none_valid, jnp.zeros_like(costs), costs_clean)
    valid = valid | none_valid
    log_valid = jnp.where(valid, 0.0, -jnp.inf)
    return costs_clean, valid, log_valid


def masked_min(costs, valid):
    return jnp.min(jnp.where(valid, costs, jnp.inf))


def masked_max(costs, valid):
    return jnp.max(jnp.where(valid, costs, -jnp.inf))


def masked_mean_std(costs, valid):
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid, costs, 0.0)) / n
    var = jnp.sum(jnp.where(valid, (costs - mean) ** 2, 0.0)) / n
    return mean, jnp.sqrt(var)


def minmax_normalize(costs, valid):
    """Min-max cost normalization over valid lanes (used by REPS/AIS/LBPS/
    ESSPS; reference: ppi/algorithms.py:184).

    Masked lanes are zeroed: their placeholder costs normalized by a
    near-degenerate range reach ~1e38, and -alpha * 1e38 overflows f32 to
    Inf, which the additive -Inf log-mask then turns into NaN (backend-
    dependent — XLA:TPU's fusion hits it where XLA:CPU's happens not to;
    found by the solver fuzz suite on device). Their value is irrelevant
    anyway: the -Inf log-mask removes them from every weighting.
    """
    lo = masked_min(costs, valid)
    hi = masked_max(costs, valid)
    cn = (costs - lo) / (hi - lo + jnp.finfo(costs.dtype).tiny)
    return jnp.where(valid, cn, 0.0)


def null_callback(iteration, f, actions, costs, policy_state) -> bool:
    """No-op callback (reference: ppi/algorithms.py:40-44)."""
    return False


def _one_iteration(solver, family, f, n_samples: int):
    def step(state, key):
        k_sample, k_eval = jax.random.split(key)
        actions, params = family.sample(state, k_sample, n_samples)
        out = f(k_eval, actions)
        # objectives may return (costs, aux-dict) — e.g. per-sample success
        # flags from an episodic env — avoiding a second evaluation pass
        costs, aux = out if isinstance(out, tuple) else (out, {})
        costs_clean, valid, log_valid = mask_costs(costs)
        batch = Batch(costs_clean, params, valid, log_valid)
        state, stats = solver.update(family, state, batch)
        mean, std = masked_mean_std(costs_clean, valid)
        stats = dict(stats)
        stats["mean"] = mean
        stats["std"] = std
        for k, v in aux.items():
            stats[k] = jnp.mean(1.0 * v)
        if "ent" not in stats:
            stats["ent"] = family.entropy(state)
        return state, (stats, actions, costs_clean)
    return step


@partial(jax.jit, static_argnames=("solver", "family", "f", "n_samples",
                                   "n_iters"))
def solve_scan(solver, family, state, f: Callable, key, n_samples: int,
               n_iters: int):
    """Fully-jitted optimization: all iterations under one ``lax.scan``.

    f: (key, actions) -> (N,) costs, pure.
    Returns (final_state, trace) with trace values stacked over iterations.
    """
    state = solver.reset(family, state)
    step = _one_iteration(solver, family, f, n_samples)

    def body(carry, key):
        state, (stats, _, _) = step(carry, key)
        return state, stats

    keys = jax.random.split(key, n_iters)
    state, trace = jax.lax.scan(body, state, keys)
    return state, trace


def solve(solver, family, state, f: Callable, key, n_samples: int,
          n_iters: int, callback=null_callback, use_tqdm: bool = False):
    """Host-driven optimization loop with callback/early-stop support.

    Each iteration is the same jitted step as ``solve_scan``; use this variant
    when a Python callback (rendering, logging, early stop) is needed
    (reference Base.__call__ semantics, ppi/algorithms.py:70-94).
    """
    state = solver.reset(family, state)
    step = jax.jit(_one_iteration(solver, family, f, n_samples))
    trace = []
    # same key stream as solve_scan so the two drivers are interchangeable
    keys = jax.random.split(key, n_iters)
    iterator = range(n_iters)
    if use_tqdm:
        try:
            from tqdm import tqdm
            iterator = tqdm(iterator)
        except ImportError:
            pass
    for i in iterator:
        state, (stats, actions, costs) = step(state, keys[i])
        trace.append(stats)
        if callback(i, f, actions, costs, state):
            break
    stacked = {k: jnp.stack([t[k] for t in trace]) for k in trace[0]} if trace else {}
    return state, stacked
