"""Expert-data collection for the model-selection pipeline.

Counterpart of the reference's CEM-MPC expert collector (reference:
mpc/model_selection/data/train_humanoid_standup_expert_cem.py): run a
strong MPC configuration on an env and log the executed (obs, action,
reward) stream to npz, to be consumed by
``ppi_tpu.model_selection.select_model``. (The reference's torch/mushroom_rl
SAC trainer is the other data source; an on-device RL trainer is out of
scope for the PPI framework itself.)

    python -m ppi_tpu.runners.collect_expert --env door-v0 --episodes 3 \
        --out /tmp/door_expert.npz
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.algorithms import make_solver
from ppi_tpu.mpc import Mpc
from ppi_tpu.policies import design_moments, make_policy
from ppi_tpu.runners.profile_mpc import build_env


def main(args):
    env = build_env(args.env)
    mean, ci, co = design_moments(env.action_low, env.action_high,
                                  ratio=1000.0)
    fam, pol = make_policy(args.policy, env.dt * jnp.arange(args.horizon),
                           env.action_dim, mean, ci, co, beta=2.0,
                           lengthscale=args.lengthscale,
                           lower=env.action_low, upper=env.action_high)
    agent = Mpc(env=env,
                solver=make_solver(args.algorithm, alpha=5.0, delta=0.9,
                                   n_elites=max(1, args.n_samples // 10)),
                family=fam,
                timesteps=args.timesteps, horizon=args.horizon,
                n_samples=args.n_samples, n_iters=args.n_iters,
                anneal=args.anneal)
    all_obs, all_act, all_rew = [], [], []
    for ep in range(args.episodes):
        carry = agent.init(pol, jax.random.key(args.seed + ep))
        es = env.reset(jax.random.key(args.seed + ep))
        carry, _ = agent.warm_start(carry, es, n_iters=args.warmstart)
        carry, es, track = agent.run_episode_scan(carry, es, collect=False)
        all_obs.append(np.asarray(track["obs"]))
        all_act.append(np.asarray(track["action"]))
        all_rew.append(np.asarray(track["reward"]))
        print(f"episode {ep}: return {float(np.sum(all_rew[-1])):.2f}",
              flush=True)
    np.savez(args.out,
             observations=np.concatenate(all_obs),
             actions=np.concatenate(all_act),
             rewards=np.concatenate(all_rew),
             episode_length=np.asarray(args.timesteps))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="door-v0")
    p.add_argument("--policy", default="ColouredNoise")
    p.add_argument("--algorithm", default="Mppi")
    p.add_argument("--lengthscale", type=float, default=0.08)
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--timesteps", type=int, default=250)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--n-samples", type=int, default=128)
    p.add_argument("--n-iters", type=int, default=1)
    p.add_argument("--anneal", type=float, default=1.0)
    p.add_argument("--warmstart", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="expert_data.npz")
    main(p.parse_args())
