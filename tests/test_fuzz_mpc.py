"""Property-based fuzzing of the full jitted MPC control step (hypothesis).

The agent-level closure of the fuzz pyramid (solvers: test_fuzz_solvers,
rollouts: test_fuzz_envs): ONE compiled control step — sample plans from
the prior, roll them out, mask, temperature-search, moment-match, extract
the action — driven from adversarial env states (extreme but finite
positions/velocities far outside the nominal reset distribution, plus the
state a diverging plant would actually hand the controller). Contract:

  M1  the emitted action is finite and inside the actuator box (the
      policy families clip; a controller must never emit NaN torques to a
      real plant, whatever state it observes);
  M2  the updated carry (policy posterior + key) stays finite, so the
      NEXT control step is well-posed — one bad observation cannot brick
      the controller;
  M3  the same adversarial state with a different PRNG key still satisfies
      M1/M2 (robustness is not key-specific).

Reference analogue: the reference's MPC loop would raise/propagate NaNs
from a diverged MuJoCo state into the posterior (mpc/mpc.py:50-110 has no
state guard); the rebuild's mask_costs + PD guards make the control step
total. These tests pin that totality.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
pytest.importorskip("hypothesis")  # property tests are optional-dep
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ppi_tpu.algorithms import make_solver
from ppi_tpu.envs.classic import ClassicState, Cartpole, Pendulum
from ppi_tpu.mpc import Mpc
from ppi_tpu.policies import design_moments, make_policy

CONFIGS = {
    # solver x family pairs covering the flagship (LBPS+SE) and baseline
    # (MPPI+white-noise) control stacks
    "pendulum-lbps-se": ("pendulum", "Lbps", "SquaredExponentialKernel"),
    "pendulum-mppi-iid": ("pendulum", "Mppi", "WhiteNoiseIid"),
    "cartpole-lbps-se": ("cartpole", "Lbps", "SquaredExponentialKernel"),
}
ENVS = {"pendulum": Pendulum, "cartpole": Cartpole}
HORIZON, N_SAMPLES = 15, 32


@functools.lru_cache(maxsize=None)
def _agent(key):
    env_name, solver_name, family_name = CONFIGS[key]
    env = ENVS[env_name]()
    t_seq = env.dt * jnp.arange(HORIZON)
    mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
    kw = dict(lower=env.action_low, upper=env.action_high)
    if family_name == "SquaredExponentialKernel":
        kw["lengthscale"] = 4 * env.dt
    fam, pol = make_policy(family_name, t_seq, env.action_dim, mean, ci, co,
                           **kw)
    agent = Mpc(env=env, solver=make_solver(solver_name, alpha=10.0,
                                            delta=0.9),
                family=fam, timesteps=40, horizon=HORIZON,
                n_samples=N_SAMPLES, n_iters=2)
    step = jax.jit(lambda carry, es: agent.control_step(carry, es, 0))
    return env, agent, pol, step


def _env_state(env, qpos, qvel):
    proto = env.reset(jax.random.key(0))
    d = proto.qpos.shape[0]
    return ClassicState(
        qpos=jnp.asarray(np.resize(np.asarray(qpos, np.float32), d)),
        qvel=jnp.asarray(np.resize(np.asarray(qvel, np.float32), d)),
        t=proto.t)


# extreme but finite: positions to |1e3| rad/m, velocities to |1e4| —
# far beyond any clip the envs apply internally, the regime where the
# quadratic/centripetal terms of the dynamics explode the rollouts
component = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                      allow_infinity=False, width=32)


class TestControlStepTotality:
    @pytest.mark.parametrize("cfg", sorted(CONFIGS))
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow], derandomize=True)
    @given(st.lists(component, min_size=2, max_size=2),
           st.lists(component, min_size=2, max_size=2),
           st.integers(min_value=0, max_value=2 ** 31 - 1))
    def test_action_finite_bounded_and_carry_sane(self, cfg, qpos, qvel,
                                                  key_seed):
        env, agent, pol, step = _agent(cfg)
        carry = agent.init(pol, jax.random.key(key_seed))
        es = _env_state(env, qpos, qvel)
        action, carry2, stats = jax.device_get(step(carry, es))
        lo, hi = np.asarray(env.action_low), np.asarray(env.action_high)
        # M1: finite, inside the actuator box (tiny fp slack on the clip)
        assert np.all(np.isfinite(action)), (cfg, action)
        assert np.all(action >= lo - 1e-5), (cfg, action)
        assert np.all(action <= hi + 1e-5), (cfg, action)
        # M2: the posterior carried into the next step is finite
        flat, _ = jax.flatten_util.ravel_pytree(carry2.policy)
        assert np.all(np.isfinite(np.asarray(flat))), cfg
        assert np.isfinite(stats["ess"]), cfg
