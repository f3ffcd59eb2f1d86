"""Render ONE multi-start restart episode to a gif.

Reruns a single restart of runners/multi_start.py's canonical protocol
(same key derivation: env task from --env-key, solver seed = restart
--index of the --base-key split) with track collection ON, then renders
the qpos history with the env's renderer. Used to record the MPC gif of
a restart the protocol found successful (e.g. the hammer-v0-hand grasp
-and-drive episode whose distributional odds live in
results/restarts/hammer-v0-hand_restarts.json).

Usage:
  python studies/render_restart.py --env hammer-v0-hand --index 0 \
      --out results/media/hammer_hand_mpc.gif
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", required=True)
    p.add_argument("--index", type=int, default=0,
                   help="restart index whose solver seed to replay")
    p.add_argument("--restarts", type=int, default=5,
                   help="restart count of the recorded protocol (the key "
                        "split width; --index selects within it)")
    p.add_argument("--env-key", type=int, default=0)
    p.add_argument("--base-key", type=int, default=0)
    p.add_argument("--warmstart", type=int, default=50)
    p.add_argument("--until-success", action="store_true",
                   help="sweep restart indices 0..restarts-1 and render "
                        "the first successful episode (the render "
                        "program is its own fp regime on the knife-edge "
                        "tasks, so its success band differs from the "
                        "recorded collect=False protocol's)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from ppi_tpu.runners.goal_success import (CONFIGS as GOAL_CONFIGS,
                                              build_canonical_agent)
    from ppi_tpu.runners.multi_start import CONFIGS as MS_CONFIGS

    cfg = dict(MS_CONFIGS.get(args.env) or GOAL_CONFIGS[args.env])
    cfg.pop("chunk", None)
    env, agent, pol = build_canonical_agent(args.env, cfg)
    es0 = env.reset(jax.random.key(args.env_key))
    keys = jax.random.split(jax.random.key(args.base_key), args.restarts)

    def episode(key):
        carry = agent.init(pol, key)
        carry, _ = agent.warm_start(carry, es0, n_iters=args.warmstart)
        return agent.run_episode_scan(carry, es0, collect=True)

    indices = (range(args.index, args.restarts) if args.until_success
               else [args.index])
    success = False
    for idx in indices:
        carry, es_f, track = episode(keys[idx])
        ret = float(np.asarray(track["reward"]).sum())
        success = bool(env.success(es_f))
        print(f"[{args.env}] restart {idx}: return {ret:.1f} "
              f"success {success}")
        if success or not args.until_success:
            break
    if args.until_success and not success:
        print("no successful restart found; rendering the last attempt")

    from ppi_tpu import render as render_mod
    qh = np.asarray(track["qpos"])
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    try:
        if args.env == "hammer-v0-hand":
            out = render_mod.render_hammer_hand(env, qh, out,
                                                board=es0.board)
        elif args.env in ("door-v0-hand", "door-v0-adroit"):
            out = render_mod.render_door_hand(env, qh, out, frame=es0.frame)
        elif args.env in ("relocate-v0-hand", "relocate-v0-adroit"):
            out = render_mod.render_relocate_hand(env, qh, out,
                                                  target=es0.target)
        else:
            out = render_mod.render_planar(env, qh, out)
    except Exception as e:
        print(f"task renderer failed ({e!r}); falling back to planar")
        out = render_mod.render_planar(env, qh, out)
    print(f"rendered {out}")


if __name__ == "__main__":
    main()
