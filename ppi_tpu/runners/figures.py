"""Paper-figure generation scripts.

Counterpart of the reference's viz/ figure suite (reference: viz/*.py —
Gaussian PPI animation frames, nonlinear-PPI comparisons, GP time-shift
illustrations): regenerates the explanatory figures from the rebuilt stack,
doubling as a visual regression harness.

    python -m ppi_tpu.runners.figures --out /tmp/figures
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def fig_gaussian_ppi(out: Path):
    """2-D Gaussian PPI iterations over Himmelblau contours (the reference's
    Gaussian-PPI animation, one panel per iteration)."""
    from ppi_tpu.algorithms import make_solver
    from ppi_tpu.envs.functions import Himmelblau
    from ppi_tpu.policies.gaussian import Gaussian

    plt = _plt()
    f = Himmelblau(dim=2)
    fam = Gaussian(dim=2)
    state = fam.init(jnp.zeros(2), 9.0 * jnp.eye(2))
    solver = make_solver("Reps", epsilon=1.0)
    xs = np.linspace(-6, 6, 120)
    grid = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2)
    zz = -np.asarray(f(None, jnp.asarray(grid))).reshape(120, 120)

    key = jax.random.key(0)
    fig, axs = plt.subplots(1, 5, figsize=(22, 4.5))
    from ppi_tpu.algorithms.base import Batch, mask_costs
    for i, ax in enumerate(axs):
        ax.contour(xs, xs, np.log(1.0 + zz - zz.min()), levels=20,
                   cmap="Greys", alpha=0.6)
        key, sk, fk_ = jax.random.split(key, 3)
        samples, params = fam.sample(state, sk, 128)
        # cost = -f (Himmelblau is negated in the suite)
        costs = -f(fk_, samples)
        c, v, lv = mask_costs(costs)
        ax.plot(np.asarray(samples)[:, 0], np.asarray(samples)[:, 1], ".",
                alpha=0.4, ms=4)
        ax.plot(float(state.mu[0]), float(state.mu[1]), "r*", ms=14)
        ax.set_title(f"iteration {i}")
        ax.set_xlim(-6, 6), ax.set_ylim(-6, 6)
        state, _ = solver.update(fam, state, Batch(c, params, v, lv))
    fig.savefig(out / "gaussian_ppi.png", bbox_inches="tight")
    plt.close(fig)


def fig_gp_shift(out: Path):
    """GP posterior conditioning under the receding-horizon shift (the
    reference's policy time-shift gif, as panels)."""
    from ppi_tpu.policies import make_policy

    plt = _plt()
    h, dt = 40, 0.05
    t0 = dt * jnp.arange(h)
    fam, state = make_policy(
        "SquaredExponentialKernel", t0, 1, jnp.zeros(1), jnp.array([1.0]),
        jnp.eye(1), lengthscale=0.25)
    state = fam.compute_prior(state, t0)
    # condition mid-horizon and shift the window several times
    state = fam.condition(state, t0[15:16], jnp.array([[1.2]]))
    fig, axs = plt.subplots(1, 4, figsize=(18, 4), sharey=True)
    for i, ax in enumerate(axs):
        mu, sig_in, sig_out, std = fam.predict(state)
        tt = np.asarray(state.t)
        m = np.asarray(mu[:, 0])
        s = np.asarray(std[:, 0])
        ax.plot(tt, m)
        ax.fill_between(tt, m - 2 * s, m + 2 * s, alpha=0.3)
        xs, _ = fam.sample(state, jax.random.key(i), 6)
        ax.plot(tt, np.asarray(xs)[:, :, 0].T, alpha=0.4, lw=0.8)
        ax.set_title(f"shift {i}")
        state = fam.update_timesteps(state, state.t + 5 * dt, anneal=1.0)
    fig.savefig(out / "gp_receding_horizon.png", bbox_inches="tight")
    plt.close(fig)


def fig_noise_priors(out: Path):
    """Sample draws from each trajectory prior family (the reference's
    policy-prior comparison panels)."""
    from ppi_tpu.policies import make_policy

    plt = _plt()
    h = 64
    t = jnp.linspace(0, 2, h)
    families = ["WhiteNoiseIid", "ColouredNoise", "SmoothExplorationNoise",
                "SquaredExponentialKernel", "Matern32Kernel", "PeriodicKernel"]
    fig, axs = plt.subplots(2, 3, figsize=(16, 7))
    for name, ax in zip(families, axs.flat):
        kw = dict(lengthscale=0.3, period=0.5)
        if name == "SmoothExplorationNoise":
            kw["beta"] = 0.3
        fam, state = make_policy(name, t, 1, jnp.zeros(1), jnp.array([1.0]),
                                 jnp.eye(1), **kw)
        xs, _ = fam.sample(state, jax.random.key(0), 8)
        ax.plot(np.asarray(t), np.asarray(xs)[:, :, 0].T, alpha=0.6, lw=1.0)
        ax.set_title(name)
    fig.savefig(out / "trajectory_priors.png", bbox_inches="tight")
    plt.close(fig)


def main(args):
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fig_gaussian_ppi(out)
    fig_gp_shift(out)
    fig_noise_priors(out)
    print(f"figures -> {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="figures")
    main(p.parse_args())
