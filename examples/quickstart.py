"""Quickstart: the three workflows in ~40 lines each of the reference's UX.

Run:  python examples/quickstart.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

# 1. Black-box optimization ---------------------------------------------------
from ppi_tpu.algorithms import make_solver, solve_scan
from ppi_tpu.envs.functions import NoisySphere
from ppi_tpu.policies.gaussian import Gaussian

fam = Gaussian(dim=10)
state = fam.init(jnp.ones(10), 0.5 * jnp.eye(10))
solver = make_solver("Reps", epsilon=2.0)
state, trace = solve_scan(solver, fam, state, NoisySphere(dim=10),
                          jax.random.key(0), n_samples=128, n_iters=30)
print(f"optimization: cost {float(trace['mean'][0]):.1f} -> "
      f"{float(trace['mean'][-1]):.3f}")

# 2. Receding-horizon MPC (whole closed-loop episode = one compiled call) -----
from ppi_tpu.envs.classic import Pendulum
from ppi_tpu.mpc import Mpc
from ppi_tpu.policies import design_moments, make_policy

env = Pendulum()
mean, cov_in, cov_out = design_moments(env.action_low, env.action_high, 1000.0)
family, policy = make_policy(
    "SquaredExponentialKernel", env.dt * jnp.arange(20), env.action_dim,
    mean, cov_in, cov_out, lengthscale=4 * env.dt,
    lower=env.action_low, upper=env.action_high)
agent = Mpc(env=env, solver=make_solver("Lbps", delta=0.9), family=family,
            timesteps=60, horizon=20, n_samples=64)
carry = agent.init(policy, jax.random.key(0))
env_state = env.reset(jax.random.key(1))
carry, env_state, track = agent.run_episode_scan(carry, env_state,
                                                 collect=False)
print(f"MPC pendulum: final rewards {track['reward'][-3:]}")

# 3. Episodic policy search (ball-in-a-cup) -----------------------------------
from ppi_tpu.algorithms import solve
from ppi_tpu.envs.episodic import BallInACup

env = BallInACup()
family, policy = make_policy(
    "RbfFeatures", env.t, env.dim_action, env.action_0,
    covariance_in=jnp.array([1e2]),
    covariance_out=jnp.diag(jnp.array([1e-3, 1e-3])),
    lengthscale=float(jnp.sqrt(3e-2)), n_features=20,
    use_derivatives=True, add_bias=True)
policy = family.condition(policy, jnp.zeros(1), env.action_0[None, :])
policy, trace = solve(make_solver("Reps", epsilon=2.0), family, policy,
                      env.objective(), jax.random.key(0),
                      n_samples=128, n_iters=25)
print(f"ball-in-a-cup: success rate "
      f"{float(trace['success_rate'][-1]):.2f} after 25 iterations")
