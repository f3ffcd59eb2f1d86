"""Expert-prior rescue attempt for the hammer-v0-hand scene distribution.

The canonical hammer-v0-hand goal sweep sits at 0.1 (single-start AND
any-of-5) over sampled board heights — the recorded knife-edge negative
result: neither temperature policies (r3) nor objective shaping (r4)
convert samples into robustness, and multi-start only helps on the fixed
scene. This study tries the reference's own remaining mechanism, offline
model selection (reference: run_mpc.py:53-61 + extract_mavn.py): fit the
policy prior to SUCCESSFUL scripted-oracle demonstrations collected across
the sampled scene distribution, then re-run the sweep with the fitted
prior. The fitted temporal correlation (swing rhythm) reshapes the sample
distribution toward swing-like trajectories — exactly what the design
prior cannot express.

Phases (each resumable from the previous phase's artifact):
  collect — scripted_hammer over K sampled scenes, keep successful demos
  fit     — H-step windows -> MN moments -> SE/periodic kernel fits
  sweep   — goal_success with --model-selection over 10 sampled scenes

Usage: python -m studies.hammer_expert_prior [--phase all] [--scenes 8]
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

HORIZON = 30
STRIDE = 5


def _env_and_oracle(env_name, engine):
    if env_name == "hammer-v0-hand":
        from ppi_tpu.envs.hammer_hand import HammerHand, scripted_hammer
        return HammerHand(engine=engine), scripted_hammer
    if env_name == "hammer-v0-adroit":
        from ppi_tpu.envs.hammer_adroit import (
            HammerAdroit, scripted_hammer_adroit)
        # the adroit oracle is certified on the canonical scene only
        # (raised boards stall at the arm's reach envelope — RESULTS.md)
        return (HammerAdroit(engine=engine, fixed_scene=True),
                scripted_hammer_adroit)
    raise SystemExit(f"no oracle wired for {env_name}")


def _outdir(env_name):
    return Path("results/hammer_prior"
                if env_name == "hammer-v0-hand"
                else f"results/hammer_prior_{env_name.split('-')[-1]}")


def collect(scenes: int, engine: str = "tensor",
            env_name: str = "hammer-v0-hand"):
    """Collect demos with the TENSOR engine by default: the scripted
    oracle's nail-seating is certified on that fp path (RESULTS.md r2-r4
    hammer studies); the soa/TPU path falls a few mm short on the same
    scenes (the recorded fp-path-dependence). The ACTION sequences are
    what the prior is fitted to, so the oracle-certified path is the
    right demo source regardless of the sweep's engine."""
    import jax

    OUTDIR = _outdir(env_name)
    env, oracle = _env_and_oracle(env_name, engine)
    demos, infos = [], []
    for k in range(scenes):
        acts = []
        t0 = time.time()
        state0 = env.reset(jax.random.key(k))
        _, info = oracle(env, state0=state0, actions=acts)
        a = np.concatenate(acts, axis=0)
        info.update(scene_key=k, steps=int(a.shape[0]),
                    board_z=float(np.asarray(state0.board)[2]),
                    wall_s=round(time.time() - t0, 1))
        infos.append(info)
        print(f"[collect] scene {k}: success={info['success']} "
              f"nail={info['nail']:.4f} steps={info['steps']} "
              f"({info['wall_s']}s)")
        if info["success"]:
            demos.append(a)
    OUTDIR.mkdir(parents=True, exist_ok=True)
    np.savez(OUTDIR / "demos.npz",
             **{f"demo_{i}": d for i, d in enumerate(demos)})
    (OUTDIR / "collect.json").write_text(json.dumps(infos, indent=1) + "\n")
    print(f"[collect] {len(demos)}/{scenes} successful demos -> "
          f"{OUTDIR / 'demos.npz'}")
    return demos


def fit(env_name: str = "hammer-v0-hand"):
    from ppi_tpu.envs.hammer_hand import HammerHand
    from ppi_tpu.model_selection import (
        default_kernels, save_model_selection, select_model)

    OUTDIR = _outdir(env_name)
    data = np.load(OUTDIR / "demos.npz")
    windows = []
    for name in data.files:
        d = data[name]
        for s in range(0, d.shape[0] - HORIZON + 1, STRIDE):
            windows.append(d[s:s + HORIZON])
    windows = np.stack(windows)
    # observation-noise floor: the scripted targets hold some dims
    # exactly constant (yaw never moves), which makes the MN flip-flop
    # singular (measured: NaN moments). The demos are quantized
    # piecewise-constant targets anyway; a 1e-3 dither is far below the
    # actuator scale and the sweep box-rescales cov_out afterwards.
    rng = np.random.default_rng(0)
    windows = windows + 1e-3 * rng.standard_normal(windows.shape).astype(
        windows.dtype)
    print(f"[fit] {windows.shape[0]} windows of H={HORIZON} from "
          f"{len(data.files)} demos")
    dt = HammerHand().dt
    kernels = {k: v for k, v in default_kernels(dt).items()
               if k in ("SquaredExponentialKernel", "PeriodicKernel")}
    payload = select_model(windows, HORIZON, kernels,
                           t=dt * np.arange(HORIZON))
    for name, entry in payload.items():
        print(f"[fit] {name}: param={np.round(entry['param'], 4)} "
              f"kl={entry['kl']:.3f}")
    save_model_selection(OUTDIR / "model_selection.npz", payload)
    print(f"[fit] wrote {OUTDIR / 'model_selection.npz'}")


def sweep(resets: int, restarts: int, fitted_scale: bool,
          env_name: str = "hammer-v0-hand"):
    from ppi_tpu.runners.goal_success import run

    OUTDIR = _outdir(env_name)
    overrides = {"model_selection": str(OUTDIR / "model_selection.npz")}
    if env_name.endswith("adroit"):
        # the 25-DoF XLA-scan sweep shape reproducibly kills the TPU
        # worker at vmap x T=400 (RESULTS.md); the megakernel is the
        # certified recorded path
        overrides["use_pallas"] = True
    if fitted_scale:
        overrides["ms_fitted_scale"] = True
    summary = run(env_name, resets, overrides=overrides,
                  restarts=restarts)
    summary["prior"] = "expert_ms" + ("_fittedscale" if fitted_scale else "")
    out = OUTDIR / f"sweep{'_fittedscale' if fitted_scale else ''}.json"
    out.write_text(json.dumps(summary, indent=1) + "\n")
    print(f"[sweep] single-start {summary['success_rate']:.2f}"
          + (f" any-of-{restarts} {summary['success_rate_any']:.2f}"
             if restarts > 1 else "") + f" -> {out}")
    return summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=["collect", "fit", "sweep", "all"],
                   default="all")
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--engine", default="tensor",
                   help="demo-collection engine (tensor = the oracle-"
                        "certified fp path)")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu) before first use")
    p.add_argument("--resets", type=int, default=10)
    p.add_argument("--restarts", type=int, default=5)
    p.add_argument("--fitted-scale", action="store_true")
    p.add_argument("--env", default="hammer-v0-hand",
                   choices=["hammer-v0-hand", "hammer-v0-adroit"])
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.phase in ("collect", "all"):
        collect(args.scenes, engine=args.engine, env_name=args.env)
    if args.phase in ("fit", "all"):
        fit(env_name=args.env)
    if args.phase in ("sweep", "all"):
        sweep(args.resets, args.restarts, args.fitted_scale,
              env_name=args.env)


if __name__ == "__main__":
    main()
