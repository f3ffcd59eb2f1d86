"""Reset-distribution parity study: dm_control full-range joint inits.

VERDICT r3 missing #6: the walker~walk / finger~spin re-hosts deliberately
narrowed dm_control's full-range per-reset joint randomization
(randomize_limited_and_rotational_joints) to bounded noise about the task
pose. Both envs now expose ``full_range_init=True`` for the suite's actual
distribution; this study MEASURES the canonical MPC configs under both
distributions (vmapped resets, one compiled program per mode) so the
narrowing is a quantified choice rather than an undocumented delta.

Usage: python -m studies.reset_parity [--resets 10] [--out results/...]
"""

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "walker~walk": dict(alg="Mppi", policy="ColouredNoise", beta=2.0,
                        alpha=10.0, anneal=0.9, timesteps=150, horizon=25,
                        n_samples=128),
    "finger~spin": dict(alg="Mppi", policy="ColouredNoise", beta=2.0,
                        alpha=10.0, anneal=0.9, timesteps=120, horizon=20,
                        n_samples=128),
}

# per-step reward is in [0, 1] for walker~walk (dm_control shaping) and
# ~[-1, 1] for finger~spin; "solved" thresholds: the episode average
# clears the band the narrowed-init runs established (walker stand+walk
# reward, finger spin saturation)
SOLVED = {"walker~walk": 0.3, "finger~spin": 0.5}


def run_mode(env_name, full_range, resets, warmstart=50, base_key=0):
    from ppi_tpu.runners.goal_success import build_canonical_agent

    cfg = dict(CONFIGS[env_name])
    cfg["env_kwargs"] = {"full_range_init": bool(full_range)}
    env, agent, pol = build_canonical_agent(env_name, cfg)

    def one_episode(key):
        k_env, k_pol = key[0], key[1]
        carry = agent.init(pol, k_pol)
        es = env.reset(k_env)
        carry, _ = agent.warm_start(carry, es, n_iters=warmstart)
        carry, es_f, track = agent.run_episode_scan(carry, es,
                                                    collect=False)
        return track["reward"].sum(), track["reward"].mean()

    keys = jnp.stack([
        jax.random.split(jax.random.key(base_key), resets),
        jax.random.split(jax.random.key(base_key + 1), resets)], axis=1)
    t0 = time.time()
    rets, means = jax.jit(jax.vmap(one_episode))(keys)
    rets = np.asarray(jax.block_until_ready(rets))
    means = np.asarray(means)
    solved = means > SOLVED[env_name]
    return {
        "full_range_init": bool(full_range),
        "resets": int(resets),
        "returns": np.round(rets, 2).tolist(),
        "mean_step_reward": np.round(means, 4).tolist(),
        "return_pct_25_50_75": np.round(
            np.percentile(rets, [25, 50, 75]), 2).tolist(),
        "solved_rate": float(solved.mean()),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resets", type=int, default=10)
    p.add_argument("--envs", nargs="*", default=list(CONFIGS))
    p.add_argument("--out", default="results/reset_parity.json")
    args = p.parse_args()

    out = {"config": {k: CONFIGS[k] for k in args.envs},
           "solved_thresholds": SOLVED, "envs": {}}
    for env_name in args.envs:
        rows = {}
        for full in (False, True):
            label = "full_range" if full else "canonical"
            rows[label] = run_mode(env_name, full, args.resets)
            print(f"[{env_name}] {label}: "
                  f"median return {rows[label]['return_pct_25_50_75'][1]}, "
                  f"solved {rows[label]['solved_rate']:.2f}, "
                  f"{rows[label]['wall_s']}s")
        out["envs"][env_name] = rows
    path = Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
