"""MPC experiment runner.

CLI-parity counterpart of the reference's MPC entry point (reference:
run_mpc.py): positional algorithm + env + policy, sampler subcommand with
--n-samples, warm start, per-step telemetry, smoothness metrics, npz results
and plots — but the env zoo is the on-device physics core and the episode
loop is one compiled scan.

Canonical configs (reference Makefile:14-21 analogues):
    python -m ppi_tpu.runners.run_mpc Cem door-v0 WhiteNoiseIid \
        --n-elites 10 MonteCarlo --n-samples 64
    python -m ppi_tpu.runners.run_mpc Lbps door-v0 SquaredExponentialKernel \
        --delta 0.9 --n-iters 2 --anneal 0.5 MonteCarlo --n-samples 64
"""

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu import viz
from ppi_tpu.algorithms import ALGORITHMS, make_solver
from ppi_tpu.envs.classic import Cartpole, Pendulum
from ppi_tpu.envs.cheetah import Cheetah
from ppi_tpu.envs.door import Door
from ppi_tpu.envs.door_adroit import DoorAdroit
from ppi_tpu.envs.door_hand import DoorHand
from ppi_tpu.envs.finger import FingerSpin
from ppi_tpu.envs.hammer import Hammer
from ppi_tpu.envs.hammer_adroit import HammerAdroit
from ppi_tpu.envs.hammer_hand import HammerHand
from ppi_tpu.envs.hopper import Hopper
from ppi_tpu.envs.pen import Pen
from ppi_tpu.envs.pen_adroit import PenAdroit
from ppi_tpu.envs.pen_hand import PenHand
from ppi_tpu.envs.fetch_pick import FetchPickAndPlace
from ppi_tpu.envs.push import FetchPush
from ppi_tpu.envs.relocate import Relocate
from ppi_tpu.envs.relocate_adroit import RelocateAdroit
from ppi_tpu.envs.relocate_hand import RelocateHand
from ppi_tpu.envs.standup import HumanoidStandup
from ppi_tpu.envs.walker import Walker, WalkerWalk
from ppi_tpu.envs.reacher import Reacher
from ppi_tpu.mpc import Mpc, fft_smoothness, signal_power
from ppi_tpu.policies import POLICY_NAMES, design_moments, make_policy
from ppi_tpu.samplers import BY_NAME as SAMPLER_NAMES
from ppi_tpu.utils import experiment_dir, save_results, setup_logging, write_args

ENVS = {
    "pendulum": Pendulum,
    "cartpole": Cartpole,
    "reacher": Reacher,
    "door-v0": Door,
    "door-v0-hand": DoorHand,
    "door-v0-adroit": DoorAdroit,
    "cheetah": Cheetah,
    "finger~spin": FingerSpin,
    "hammer-v0": Hammer,
    "hammer-v0-hand": HammerHand,
    "hammer-v0-adroit": HammerAdroit,
    "hopper": Hopper,
    "pen-v0": Pen,
    "pen-v0-hand": PenHand,
    "pen-v0-adroit": PenAdroit,
    "relocate-v0": Relocate,
    "relocate-v0-hand": RelocateHand,
    "relocate-v0-adroit": RelocateAdroit,
    "humanoid-standup": HumanoidStandup,
    "fetch-push": FetchPush,
    "fetch-pick": FetchPickAndPlace,
    "walker2d": Walker,
    "walker~walk": WalkerWalk,
}


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("algorithm", choices=sorted(ALGORITHMS))
    parser.add_argument("env", choices=sorted(ENVS))
    parser.add_argument("policy", choices=POLICY_NAMES)
    parser.add_argument("--timesteps", type=int, default=250)
    parser.add_argument("--horizon", type=int, default=30)
    parser.add_argument("--n-warmstart-iters", type=int, default=50)
    parser.add_argument("--n-iters", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dir", type=str, default=None)
    parser.add_argument("--name", type=str, default="")
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--no-plots", action="store_true")
    parser.add_argument("--render", action="store_true",
                        help="save a schematic episode GIF (engine envs)")
    parser.add_argument("--render-3d", action="store_true",
                        help="also save a ray-cast 3-D episode GIF of the "
                             "scene geometry (render3d; any engine env)")
    parser.add_argument("--video-format", choices=["gif", "avi", "mp4"],
                        default="gif",
                        help="episode render container: gif (imageio), avi "
                             "(pure-Python MJPEG muxer), mp4 (needs "
                             "imageio-ffmpeg; degrades to avi otherwise)")
    parser.add_argument("--anneal", type=float, default=1.0)
    parser.add_argument("--host-loop", action="store_true",
                        help="per-step host loop instead of one episode scan")
    parser.add_argument("--checkpoint-every", type=int, default=0,
                        help="checkpoint (agent carry + env state + track) "
                             "every N control steps so a minutes-long "
                             "device episode survives interruption; resume "
                             "with --resume (needs --dir)")
    parser.add_argument("--resume", action="store_true",
                        help="resume an interrupted episode from the "
                             "experiment dir's checkpoint (implies "
                             "--force for the exists-guard)")
    parser.add_argument("--use-pallas", action="store_true",
                        help="roll out through the whole-rollout Pallas "
                             "megakernel (TPU; env must implement the "
                             "scalar-SoA contract)")
    parser.add_argument("--risk-quantile", type=float, default=0.25,
                        help="CVaR quantile over per-step plan costs "
                             "(active only with --risk-weight > 0)")
    parser.add_argument("--unroll", type=int, default=1,
                        help="lax.scan unroll for the rollout horizon "
                             "(latency lever for small-batch control "
                             "steps; see studies/adroit_latency.py)")
    parser.add_argument("--risk-weight", type=float, default=0.0,
                        help="risk-averse planning: blend weight for the "
                             "CVaR of per-step costs (envs.base."
                             "risk_aggregate); 0 = plain -sum(rewards)")
    parser.add_argument("--model-selection", type=str, default=None,
                        help="npz from ppi_tpu.model_selection: build the "
                             "policy from fitted (mean, covariance_out, "
                             "kernel params) instead of design_moments "
                             "(reference: run_mpc.py:53-61)")
    parser.add_argument("--ms-fitted-scale", action="store_true",
                        help="with --model-selection, keep the expert's "
                             "absolute action variance instead of rescaling "
                             "to the actuator-box exploration scale")
    parser.add_argument("--optimize-prior", action="store_true",
                        help="after warm start, refit the kernel "
                             "hyperparameters to the warm-started posterior "
                             "mean by marginal likelihood (kernel families "
                             "only; reference: ppi/policies.py:696-713)")
    # algorithm hyperparameters
    parser.add_argument("--n-elites", type=int, default=10)
    parser.add_argument("--alpha", type=float, default=10.0)
    parser.add_argument("--epsilon", type=float, default=2.0)
    parser.add_argument("--delta", type=float, default=0.9)
    # policy hyperparameters
    parser.add_argument("--beta", type=float, default=2.0)
    parser.add_argument("--lengthscale", type=float, default=1.0)
    parser.add_argument("--n-features", type=int, default=10)
    parser.add_argument("--order", type=int, default=10)

    sub = parser.add_subparsers(title="sampling", dest="sampling",
                                required=True)
    for samp in sorted(set(SAMPLER_NAMES)):
        sp = sub.add_parser(samp)
        sp.add_argument("--n-samples", type=int, default=64)
    return parser


def main(args):
    filepath = None
    if args.dir is not None:
        name = (f"{args.algorithm}_{args.env}_{args.policy}_{args.sampling}_"
                f"{args.n_samples}_{args.seed}_{args.name}")
        filepath = experiment_dir(Path(args.dir), name,
                                  args.force or args.resume)
        if filepath is None:
            print("experiment done!")
            return None
        write_args(args, filepath)
    setup_logging(filepath, args)

    env = ENVS[args.env]()
    dt = env.dt
    # RBF features span the whole episode; everything else spans the horizon
    # (reference: run_mpc.py:143-147)
    span = args.timesteps if args.policy == "RbfFeatures" else args.horizon
    time_sequence = dt * jnp.arange(span)
    mean, cov_in, cov_out = design_moments(env.action_low, env.action_high,
                                           ratio=1000.0)
    lengthscale, period = args.lengthscale, dt
    if args.model_selection is not None:
        # fitted-prior artifact replaces the design moments
        # (reference: run_mpc.py:53-61)
        from ppi_tpu.model_selection import load_model_selection
        payload = load_model_selection(args.model_selection)
        if args.policy not in payload:
            raise SystemExit(
                f"--model-selection artifact has no entry for "
                f"{args.policy!r}; available: {sorted(payload)}")
        moments = payload[args.policy]
        mean = jnp.asarray(moments["mean"])
        cov_out = jnp.asarray(moments["covariance_out"])
        param = np.asarray(moments["param"])
        cov_in = jnp.asarray(param[:1])  # kernel variance sigma
        if param.shape[0] > 1:
            lengthscale = float(param[1])
        if param.shape[0] > 2:
            period = float(param[2])
        if not args.ms_fitted_scale:
            # Keep the fitted temporal/output CORRELATION structure but
            # restore the actuator-box exploration scale: a converged
            # expert's action variance is far too small to explore from
            # (a design-moments prior with fitted smoothness).
            design_var = 0.25 * (env.action_high - env.action_low) ** 2
            fitted_var = cov_in[0] * jnp.diagonal(cov_out)
            d = jnp.sqrt(design_var / jnp.maximum(fitted_var, 1e-12))
            cov_out = cov_out * jnp.outer(d, d)
        logging.info("model selection: %s param=%s kl=%.4f", args.policy,
                     np.round(param, 4), float(moments.get("kl", np.nan)))
    use_particles = args.algorithm == "iCem"
    family, policy = make_policy(
        args.policy, time_sequence, env.action_dim, mean, cov_in, cov_out,
        lengthscale=lengthscale, period=period, n_features=args.n_features,
        order=args.order, beta=args.beta,
        sampler="Particles" if use_particles else args.sampling,
        lower=env.action_low, upper=env.action_high,
        max_particles=max(1, int(0.33 * args.n_elites)))
    solver = make_solver(args.algorithm, alpha=args.alpha,
                         epsilon=args.epsilon, delta=args.delta,
                         n_elites=args.n_elites,
                         dimension=family.dim_features)
    if args.n_samples < family.dim_features:
        # with fewer samples than weight dimensions the fitted input
        # covariance is rank-deficient, the PD guard reverts every update
        # (mean included — reference parity: ppi/policies.py:499-516), and
        # the episode degenerates to the prior mean. Surface it loudly.
        logging.warning(
            "n_samples=%d < dim_features=%d: the moment-matched covariance "
            "cannot be PD, so every posterior update will be reverted. "
            "Increase --n-samples or reduce --n-features/--horizon.",
            args.n_samples, family.dim_features)

    if args.use_pallas:
        from ppi_tpu.envs.physics.pallas_rollout import supports_pallas
        if not supports_pallas(env):
            raise SystemExit(f"--use-pallas: {args.env} does not implement "
                             "the scalar-SoA kernel contract")
        if jax.default_backend() == "cpu":
            # a compiled (non-interpret) pallas_call on the CPU backend dies
            # with an obscure Mosaic lowering error — fail with a clear
            # message instead (ADVICE r2; bench.py applies the same check)
            raise SystemExit("--use-pallas needs a TPU backend; the current "
                             "JAX backend is 'cpu'")
    agent = Mpc(env=env, solver=solver, family=family,
                timesteps=args.timesteps, horizon=args.horizon,
                n_samples=args.n_samples, n_iters=args.n_iters,
                anneal=args.anneal, use_map=args.algorithm == "iCem",
                use_pallas=args.use_pallas,
                risk_quantile=args.risk_quantile,
                risk_weight=args.risk_weight,
                unroll=args.unroll)
    carry = agent.init(policy, jax.random.key(args.seed))
    env_state = env.reset(jax.random.key(args.seed))

    # mid-episode checkpoint/resume (VERDICT r3 next #8): the agent carry +
    # env state are a small pytree, the chunked scan is the same per-step
    # program, so a resumed episode reproduces the uninterrupted run
    ckpt_path = (filepath / "episode_checkpoint.npz") if filepath else None
    track_path = (filepath / "episode_track.npz") if filepath else None
    start_step = 0
    if args.resume and ckpt_path is not None and ckpt_path.exists():
        from ppi_tpu.utils import load_checkpoint
        (carry, env_state), start_step = load_checkpoint(
            ckpt_path, (carry, env_state))
        logging.info("resumed from %s at control step %d", ckpt_path,
                     start_step)

    if args.n_warmstart_iters > 0 and start_step == 0:
        carry, wtrace = agent.warm_start(carry, env_state,
                                         args.n_warmstart_iters)
        logging.info("Warm start: %.2f +/- %.2f",
                     float(wtrace["mean"][-1]), float(wtrace["std"][-1]))
        if not args.no_plots and filepath is not None:
            viz.plot_algorithm_result(
                {k: np.asarray(v) for k, v in wtrace.items()},
                filepath / "result_warmup")

    if args.optimize_prior and start_step == 0:
        if not hasattr(family, "optimize_hyper"):
            raise SystemExit("--optimize-prior requires a kernel policy "
                             f"family, got {args.policy!r}")
        old = np.asarray(carry.policy.hyper)
        new_policy = family.optimize_hyper(carry.policy, carry.policy.mean)
        carry = carry.replace(policy=new_policy)
        logging.info("optimize-prior: hyper %s -> %s", np.round(old, 4),
                     np.round(np.asarray(new_policy.hyper), 4))

    if args.checkpoint_every and filepath is not None:
        from ppi_tpu.utils import save_checkpoint
        prev_track = None
        if start_step > 0:
            if not track_path.exists():
                raise SystemExit(
                    f"--resume: checkpoint at step {start_step} but "
                    f"{track_path} is missing")
            data = np.load(track_path)
            prev_track = {k: data[k] for k in data.files}
            n_rows = len(next(iter(prev_track.values())))
            if n_rows < start_step:
                raise SystemExit(
                    f"--resume: track file has {n_rows} steps but the "
                    f"checkpoint says {start_step} — inconsistent state")
            # a crash between the track write and the checkpoint write
            # leaves EXTRA rows (the checkpoint is the commit point):
            # trim to the checkpointed step and replay the last chunk
            prev_track = {k: v[:start_step] for k, v in prev_track.items()}

        def on_chunk(t, c, es, tracks):
            # track FIRST, checkpoint SECOND: the checkpoint's step is the
            # commit point, so every crash window resumes consistently
            done = {k: np.concatenate(
                ([prev_track[k]] if prev_track else [])
                + [np.asarray(tr[k]) for tr in tracks])
                for k in tracks[0]}
            np.savez(track_path, **done)
            save_checkpoint(ckpt_path, (c, es), step=t)

        carry, env_state, track = agent.run_episode_resumable(
            carry, env_state, start=start_step,
            chunk=args.checkpoint_every, on_chunk=on_chunk)
        if prev_track:
            track = {k: np.concatenate([prev_track[k], np.asarray(track[k])])
                     for k in track} if track else prev_track
    elif args.host_loop:
        carry, env_state, track = agent.run_episode(carry, env_state,
                                                    use_tqdm=True)
    else:
        carry, env_state, track = agent.run_episode_scan(carry, env_state,
                                                         collect=False)
    rewards = np.asarray(track["reward"])
    acts = np.asarray(track["action"])
    obs = np.asarray(track["obs"])
    ret = float(rewards.sum())
    logging.info("Return: %.2f over %d timesteps", ret, args.timesteps)
    success = np.nan
    if hasattr(env, "success"):
        success = float(bool(env.success(env_state)))
        logging.info("Success: %s", bool(success))

    power = float(signal_power(jnp.asarray(acts)))
    sm, sm_max, sp, freq, act_norm = fft_smoothness(jnp.asarray(acts), dt)
    logging.info("Smoothness: %.3f, Max: %.3f, Power: %.3f",
                 float(sm), float(sm_max), power)

    if not args.no_plots and filepath is not None:
        viz.plot_sequence(obs, filepath / "observation_sequence")
        viz.plot_sequence(acts, filepath / "action_sequence_all")
        viz.plot_sequence(np.asarray(track["ess"]), filepath / "ess_history")
        viz.plot_sequence(np.asarray(track["alpha"]),
                          filepath / "alpha_history")
        viz.plot_smoothness(np.asarray(sp), np.asarray(freq),
                            np.asarray(act_norm), filepath / "smoothness")
    if args.render and filepath is not None and "qpos" in track:
        from ppi_tpu import render as render_mod
        qh = np.asarray(track["qpos"])
        out = filepath / f"episode.{args.video_format}"
        try:
            if args.env == "door-v0":
                out = render_mod.render_door(env, qh, out,
                                             frame=env_state.frame)
            elif args.env == "door-v0-hand":
                out = render_mod.render_door_hand(env, qh, out,
                                                  frame=env_state.frame)
            elif args.env == "hammer-v0-hand":
                out = render_mod.render_hammer_hand(env, qh, out,
                                                    board=env_state.board)
            elif args.env == "relocate-v0":
                out = render_mod.render_relocate(
                    env, qh, out, target=env_state.target)
            elif args.env == "relocate-v0-hand":
                out = render_mod.render_relocate_hand(
                    env, qh, out, target=env_state.target)
            elif args.env == "fetch-pick":
                out = render_mod.render_relocate(
                    env, qh, out, target=env_state.target)
            elif args.env == "pen-v0":
                out = render_mod.render_pen(
                    env, qh, out, target=env_state.target_axis)
            elif args.env == "pen-v0-hand":
                out = render_mod.render_pen_hand(
                    env, qh, out, target=env_state.target_axis)
            else:
                out = render_mod.render_planar(env, qh, out)
            logging.info("rendered %s", out)
        except Exception:
            logging.exception("rendering failed")
    if args.render_3d and filepath is not None and "qpos" in track \
            and hasattr(env, "_model"):
        from ppi_tpu import render3d
        try:
            dyn_pos = None
            if getattr(env, "scalar_dyn_body", None) is not None:
                dyn_pos = np.asarray(env.scalar_dyn_consts(env_state))
                dyn_pos = dyn_pos if dyn_pos.shape == (3,) else None
            out3d = render3d.save_gif_3d(
                filepath / "episode_3d.gif", env,
                np.asarray(track["qpos"]), dyn_pos=dyn_pos,
                style=render3d.SceneStyle(floor=0.0))
            logging.info("rendered %s", out3d)
        except Exception:
            logging.exception("3-D rendering failed")

    if filepath is not None:
        save_results(filepath, obs=obs, actions=acts, rewards=rewards,
                     ess=np.asarray(track["ess"]),
                     alphas=np.asarray(track["alpha"]),
                     sm=float(sm), sm_max=float(sm_max), power=power,
                     success=success,
                     action_signal=np.asarray(act_norm))
    return ret, track


if __name__ == "__main__":
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    main(build_parser().parse_args())
