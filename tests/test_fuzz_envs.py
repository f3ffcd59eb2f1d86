"""Property-based fuzzing of the rollout/containment layer (hypothesis).

The physics oracles (tests/test_physics.py) pin trajectories on nominal
action sequences; this module instead throws adversarial plans at the
rollout layer — saturating, exploding (1e18), NaN and Inf actions — and
asserts the divergence-containment contract the optimizer stack relies on
(reference per-worker containment: mpc/wrappers.py:34-51 + the Base.filter
masking; rebuild: envs/base.py rollout guard + algorithms/base.mask_costs):

  E1  in-bounds random plans never produce non-finite states or rewards;
  E2  every diverged lane's cost is non-finite (NaN from the state guard,
      or +/-Inf when a reward diverges while the state stays finite — the
      reacher's distance reward does this), so mask_costs (~isfinite)
      catches exactly the diverged lanes;
  E3  per-lane isolation: corrupting ONE lane of a batch leaves every other
      lane's cost bit-identical (vmap containment, no cross-lane coupling);
  E4  a poisoned lane stays poisoned (the guard latches: once a state goes
      non-finite mid-rollout, every later reward of that lane is NaN).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
pytest.importorskip("hypothesis")  # property tests are optional-dep
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ppi_tpu.algorithms.base import mask_costs
from ppi_tpu.envs.base import batch_rollout, mpc_objective
from ppi_tpu.envs.classic import Cartpole, Pendulum
from ppi_tpu.envs.door import Door
from ppi_tpu.envs.reacher import Reacher

H, N = 25, 8

ENVS = {
    "pendulum": Pendulum,
    "cartpole": Cartpole,
    "reacher": Reacher,
    "door-v0": Door,
}

CORRUPTIONS = ("none", "huge", "neg_huge", "nan", "inf", "mixed")


@functools.lru_cache(maxsize=None)
def _setup(name):
    env = ENVS[name]()
    state0 = env.reset(jax.random.key(0))
    f = jax.jit(mpc_objective(env, state0))
    rollout_fn = jax.jit(
        lambda acts: batch_rollout(env, state0, acts)[1])
    return env, state0, f, rollout_fn


def _plans(env, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    lo, hi = np.asarray(env.action_low), np.asarray(env.action_high)
    mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)
    return (mid + scale * half * rng.uniform(-1.0, 1.0, (N, H, env.action_dim))
            ).astype(np.float32)


def _corrupt(plans, kind, lane, rng):
    plans = plans.copy()
    if kind == "none":
        return plans
    if kind == "huge":
        plans[lane] = 1e18
    elif kind == "neg_huge":
        plans[lane] = -1e18
    elif kind == "nan":
        plans[lane, H // 2:] = np.nan
    elif kind == "inf":
        plans[lane, 0] = np.inf
    elif kind == "mixed":
        plans[lane] = rng.choice(
            np.array([1e18, -1e18, np.nan, np.inf], np.float32),
            size=plans[lane].shape)
    return plans


class TestRolloutContainment:
    @pytest.mark.parametrize("name", sorted(ENVS))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow], derandomize=True)
    @given(st.integers(min_value=0, max_value=2 ** 31 - 1))
    def test_in_bounds_plans_stay_finite(self, name, seed):
        """E1: the actuator box is a safe envelope for every env."""
        env, _, f, rollout_fn = _setup(name)
        plans = _plans(env, seed)
        rewards = np.asarray(rollout_fn(jnp.asarray(plans)))
        assert np.all(np.isfinite(rewards)), name
        costs = np.asarray(f(jax.random.key(0), jnp.asarray(plans)))
        assert np.all(np.isfinite(costs)), name

    @pytest.mark.parametrize("name", sorted(ENVS))
    @pytest.mark.parametrize("kind", CORRUPTIONS)
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow], derandomize=True)
    @given(st.integers(min_value=0, max_value=2 ** 31 - 1),
           st.integers(min_value=0, max_value=N - 1))
    def test_diverged_lanes_are_nan_and_isolated(self, name, kind, seed,
                                                 lane):
        """E2 + E3: corrupted lanes go NaN (never Inf) without touching
        any other lane, and mask_costs sees exactly the survivors."""
        env, _, f, _ = _setup(name)
        rng = np.random.default_rng(seed)
        clean = _plans(env, seed)
        dirty = _corrupt(clean, kind, lane, rng)
        c0 = np.asarray(f(jax.random.key(0), jnp.asarray(clean)))
        c1 = np.asarray(f(jax.random.key(0), jnp.asarray(dirty)))
        # E2: a NaN-carrying plan must yield a non-finite lane cost (a
        # silently-finite cost from garbage actions would poison the
        # posterior). Huge/Inf plans may legitimately stay finite on envs
        # that clip actuation internally (clip(inf) saturates to the
        # bound) — for those the isolation and mask checks below are the
        # contract.
        if kind in ("nan", "mixed"):
            assert not np.isfinite(c1[lane]), (name, kind, c1[lane])
        # E3: untouched lanes are bit-identical
        others = np.arange(N) != lane
        np.testing.assert_array_equal(c0[others], c1[others], err_msg=name)
        # the mask matches finiteness exactly
        _, valid, _ = jax.device_get(mask_costs(jnp.asarray(c1)))
        np.testing.assert_array_equal(np.asarray(valid), np.isfinite(c1))

    @pytest.mark.parametrize("name", ["pendulum", "door-v0"])
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow], derandomize=True)
    @given(st.integers(min_value=0, max_value=2 ** 31 - 1))
    def test_guard_latches_after_divergence(self, name, seed):
        """E4: once a lane's state goes non-finite, every later reward of
        that lane is NaN (the guard never 'recovers' a poisoned lane)."""
        env, _, _, rollout_fn = _setup(name)
        plans = _plans(env, seed)
        plans[0, H // 2] = np.nan  # poison one step of lane 0
        rewards = np.asarray(rollout_fn(jnp.asarray(plans)))
        tail = rewards[0, H // 2:]
        assert np.all(np.isnan(tail)), tail
        assert np.all(np.isfinite(rewards[1:])), name
