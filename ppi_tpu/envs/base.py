"""Environment protocol and batched rollout machinery.

The TPU-native replacement for the reference's process-pool rollout backend
(reference: mpc/wrappers.py:121-189): an environment is a pure step function
over a pytree state, a rollout is a ``lax.scan`` over the horizon, and the
sample batch is a ``vmap`` over rollouts — policy sampling, N x H physics
steps, reward reduction and the posterior update all fuse into one compiled
program. The queue/pickle layer disappears entirely.

Failure containment (SURVEY.md §5): a diverged rollout yields NaN rewards in
its own lane only; the solver's mask turns it into a zero-weight sample —
the vmap equivalent of the reference's MujocoException -> NaN-row protocol
(reference: mpc/wrappers.py:110-116).
"""

from typing import Protocol

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class Env(Protocol):
    """Static env config; dynamics are pure functions of (state, action)."""

    action_dim: int
    dt: float

    def reset(self, key):
        ...

    def step(self, state, action):
        """(state, action) -> (next_state, reward)."""
        ...

    def observe(self, state):
        ...


def rollout(env, state0, action_sequence, guard: bool = True,
            unroll: int = 1):
    """Roll one action sequence; returns (final_state, rewards (H,)).

    With ``guard``, a non-finite state poisons only the remaining steps of
    THIS rollout (reward -> NaN), mirroring the reference's divergence
    containment per worker rollout. ``unroll`` trades compile time for fewer
    sequential scan iterations — the north-star workload is latency-bound on
    ~H sequential fused kernels (see RESULTS.md roofline), so unrolling the
    horizon scan shortens the critical path.
    """

    def body(state, action):
        next_state, reward = env.step(state, action)
        if guard:
            flat = ravel_pytree(next_state)[0]
            bad = ~jnp.all(jnp.isfinite(flat))
            reward = jnp.where(bad, jnp.nan, reward)
        return next_state, reward

    return jax.lax.scan(body, state0, action_sequence, unroll=unroll)


def batch_rollout(env, state0, action_sequences, guard: bool = True,
                  unroll: int = 1):
    """vmap over the sample axis: (N, H, d_a) -> (final_states, (N, H) rewards).

    ``state0`` is a single state, broadcast to every lane (the MPC case:
    every sampled plan starts from the frozen real-env state, the analogue of
    the reference's FreezeMujoco context; reference: mpc/wrappers.py:34-51).
    """
    return jax.vmap(lambda acts: rollout(env, state0, acts, guard, unroll))(
        action_sequences)


def risk_aggregate(rewards, horizon_mask=None, risk_quantile: float = 1.0,
                   risk_weight: float = 0.0):
    """(N, H) per-step rewards -> (N,) per-sample costs, optionally
    risk-averse.

    Default (risk_weight=0): cost = -sum(rewards), the reference's
    aggregation (reference: mpc/wrappers.py:186). With risk_weight w > 0
    and quantile q < 1, the cost blends in the CVaR of the per-step costs
    over the horizon::

        cost = (1 - w) * sum(c_t)  +  w * H * CVaR_q(c_t),
        CVaR_q = mean of the worst ceil(q*H) per-step costs c_t = -r_t.

    H * CVaR_1 == sum(c_t), so the blend is continuous in both knobs. The
    risk term up-weights plans whose WORST steps are bad — e.g. a plan
    that knocks the task object out of the workspace collapses its
    late-horizon rewards, which the plain sum dilutes across the window
    but the upper quantile concentrates. Masked (past-episode) steps
    contribute cost 0, matching the sum semantics.
    """
    if horizon_mask is not None:
        rewards = rewards * horizon_mask[None, :]
    costs = -rewards
    total = jnp.sum(costs, axis=1)
    if risk_weight <= 0.0 or risk_quantile >= 1.0:
        return total
    h = costs.shape[1]
    k = max(1, min(h, int(round(risk_quantile * h))))
    worst, _ = jax.lax.top_k(costs, k)
    cvar = jnp.mean(worst, axis=1)
    return (1.0 - risk_weight) * total + risk_weight * h * cvar


def mpc_objective(env, state0, horizon_mask=None, guard: bool = True,
                  unroll: int = 1, risk_quantile: float = 1.0,
                  risk_weight: float = 0.0):
    """Build the ``f(key, actions) -> costs`` callable the solvers consume.

    ``horizon_mask`` (H,) zeroes rewards beyond the episode end — the
    static-shape version of the reference's window truncation
    (reference: mpc/mpc.py:50-56). Cost = -sum(rewards) per sample
    (reference: mpc/wrappers.py:186), or the CVaR blend of
    ``risk_aggregate`` when ``risk_weight`` > 0.
    """

    def f(key, action_sequences):
        del key
        _, rewards = batch_rollout(env, state0, action_sequences, guard,
                                   unroll)
        return risk_aggregate(rewards, horizon_mask, risk_quantile,
                              risk_weight)

    return f
