"""Animated paper figures.

Counterparts of the reference's four viz/ gif scripts (reference:
viz/gaussian_ppi.py, viz/nonlinear_ppi.py, viz/policy_time_shift.py,
viz/policy_time_resolution.py), rebuilt on the framework's own on-device
machinery: the temperature searches are the in-graph solvers from
``ppi_tpu.algorithms``, the weights/moments come from ``ppi_tpu.ops``, and
the GP shift/resolution animations drive the real
``BaseKernel.update_timesteps`` / kernel cross-covariance code paths rather
than inline reimplementations (the reference's scripts re-derive CEM/ESSPS/
LBPS inline; viz/nonlinear_ppi.py:79-244).

    python -m ppi_tpu.runners.animations --out figures/ [--frames 40]
"""

import argparse
from pathlib import Path

import numpy as np


def _gif(path, frames, fps=20):
    import imageio.v2 as imageio
    imageio.mimsave(Path(path), frames, fps=fps, loop=0)
    return Path(path)


def _rasterize(fig):
    import matplotlib.pyplot as plt
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def anim_gaussian_ppi(out: Path, n_frames: int = 40):
    """Gaussian prior -> Gibbs posterior as the temperature alpha anneals
    (reference: viz/gaussian_ppi.py — Laplace-form posterior on a quadratic
    cost)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.linspace(-10, 10, 600)
    mu_c, sigma2_c = 5.0, 0.5          # quadratic cost centre/curvature
    mu0, sigma0 = -5.0, 1.0
    pdf = lambda m, s: np.exp(-0.5 * ((x - m) / s) ** 2) / (
        s * np.sqrt(2 * np.pi))
    frames = []
    for alpha in np.linspace(0.0, 3.0, n_frames):
        s2 = 1.0 / (1.0 / sigma0 ** 2 + alpha / sigma2_c)
        m = mu0 - alpha * s2 * (mu0 - mu_c) / sigma2_c
        fig, ax = plt.subplots(figsize=(7, 3))
        axf = ax.twinx()
        axf.plot(x, -0.5 * (x - mu_c) ** 2 / sigma2_c, "k-", lw=1)
        ax.plot(x, pdf(mu0, sigma0), "b", label="prior $p$")
        ax.fill_between(x, pdf(mu0, sigma0), color="b", alpha=0.2)
        ax.plot(x, pdf(m, np.sqrt(s2)), "c",
                label=r"posterior $q_\alpha$")
        ax.fill_between(x, pdf(m, np.sqrt(s2)), color="c", alpha=0.2)
        ax.set_ylim(0, 4)
        ax.set_title(f"alpha = {alpha:.2f}")
        ax.legend(loc="upper right")
        frames.append(_rasterize(fig))
    return _gif(out / "gaussian_ppi.gif", frames)


def anim_nonlinear_ppi(out: Path, n_frames_per: int = 8):
    """CEM / ESSPS / LBPS importance weights and moment-matched next prior
    on a multimodal reward (reference: viz/nonlinear_ppi.py) — here the
    temperatures come from the framework's own in-graph solvers."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ppi_tpu import ops

    x = np.linspace(-10, 10, 600)
    mu_r, sigma2_r = 5.0, 2.0
    reward = lambda z: (np.exp(-0.5 * (z - mu_r) ** 2 / sigma2_r)
                        * np.abs(np.sin(6 * z)) - 1.0)
    rng = np.random.default_rng(0)
    samples = rng.normal(0.0, 1.0, size=128)
    costs = jnp.asarray(-reward(samples))
    pdf = lambda m, s: np.exp(-0.5 * ((x - m) / s) ** 2) / (
        s * np.sqrt(2 * np.pi))

    def posterior_from(log_w):
        mu, sig, ess = ops.m_projection(jnp.asarray(log_w),
                                        jnp.asarray(samples)[:, None],
                                        use_pallas="never")
        return float(mu[0]), float(jnp.sqrt(sig[0, 0])), float(ess)

    panels = []
    # CEM elite weighting over shrinking elite sets
    for k in np.linspace(64, 8, n_frames_per).astype(int):
        thresh = jnp.sort(costs)[k - 1]
        log_w = jnp.where(costs <= thresh, 0.0, -1e12)
        panels.append((f"CEM, k={int(k)}", "g", np.asarray(log_w),
                       posterior_from(log_w)))
    # ESSPS: temperature matched to a target effective sample size
    cn = (costs - costs.min()) / (jnp.ptp(costs) + 1e-9)
    for ess_target in np.linspace(64, 4, n_frames_per):
        def ess_of(a, cn=cn):
            lw = -a * cn
            nw = lw - jax.scipy.special.logsumexp(lw)
            return jnp.exp(-jax.scipy.special.logsumexp(2 * nw))
        alpha = float(ops.bisect_decreasing(ess_of, float(ess_target),
                                            1e-3, 1e3))
        log_w = -alpha * cn
        panels.append((f"ESSPS, ESS*={ess_target:.0f}", "c",
                       np.asarray(log_w), posterior_from(log_w)))
    # LBPS: concentration-bound-minimizing temperature per delta
    for delta in np.linspace(0.5, 0.99, n_frames_per):
        lam = float(np.sqrt((1 - delta) / delta))
        def bound(a, cn=cn, lam=lam):
            lw = -a * cn
            nw = lw - jax.scipy.special.logsumexp(lw)
            ess = jnp.exp(-jax.scipy.special.logsumexp(2 * nw))
            return jnp.sum(jnp.exp(nw) * cn) + lam / jnp.sqrt(ess)
        alpha = float(ops.golden_section_min(bound, 1e-3, 1e3, iters=60))
        log_w = -alpha * cn
        panels.append((f"LBPS, delta={delta:.2f}", "m",
                       np.asarray(log_w), posterior_from(log_w)))

    prior_pdf = pdf(0.0, 1.0)
    frames = []
    for title, color, log_w, (m, s, ess) in panels:
        nw = np.exp(log_w - log_w.max())
        nw = nw / nw.sum()
        fig, ax = plt.subplots(figsize=(7, 3))
        axf = ax.twinx()
        axf.plot(x, reward(x), "k-", lw=1)
        axf.set_ylim(-1.05, 0.1)
        ax.plot(x, prior_pdf, "b", label="prior $p$")
        ax.fill_between(x, prior_pdf, color="b", alpha=0.15)
        ax.vlines(samples, 0, 3.0 * nw, color="r", alpha=0.25)
        ax.plot(x, pdf(m, max(s, 1e-2)), color=color,
                label=r"next prior $q_\alpha \to p$")
        ax.fill_between(x, pdf(m, max(s, 1e-2)), color=color, alpha=0.2)
        ax.set_ylim(0, 3)
        ax.set_title(f"{title}   (ESS = {ess:.1f})")
        ax.legend(loc="upper left")
        frames.append(_rasterize(fig))
    return _gif(out / "nonlinear_ppi.gif", frames, fps=2)


def _fit_tracking_gp(horizon=30, dt=1.0 / 30.0, n_iters=40, n_samples=256):
    """CEM-fit an SE-kernel GP policy to the reference's square-wave
    tracking task (reference: viz/policy_time_shift.py:36-50)."""
    import jax
    import jax.numpy as jnp

    from ppi_tpu.algorithms import make_solver, solve_scan
    from ppi_tpu.policies import make_policy

    t = dt * jnp.arange(horizon)
    u_d = lambda tau: 1.0 * (jnp.cos(2 * jnp.pi * tau) > 0.0)
    target = u_d(t)[:, None]

    fam, pol = make_policy(
        "SquaredExponentialKernel", t, 1,
        mean=jnp.asarray([0.5]), covariance_in=jnp.asarray([1e2]),
        covariance_out=0.5 * jnp.asarray([[1e-2]]), lengthscale=0.2,
        lower=jnp.asarray([0.0]), upper=jnp.asarray([1.0]))

    def cost(key, actions):
        del key
        return jnp.sum(jnp.abs(actions - target[None]), axis=(1, 2))

    solver = make_solver("Cem", n_elites=n_samples // 10)
    pol, _ = solve_scan(solver, fam, pol, cost, jax.random.key(0),
                        n_samples, n_iters)
    return fam, pol, t, dt, u_d


def anim_policy_time_shift(out: Path, n_frames: int = 24):
    """The receding-horizon GP conditioning shift, animated: the fitted
    posterior slides along time via ``update_timesteps`` and fresh samples
    stay consistent with the conditioned window (reference:
    viz/policy_time_shift.py)."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fam, pol, t, dt, u_d = _fit_tracking_gp()
    horizon = t.shape[0]
    t_long = dt * np.arange(2 * horizon)
    frames = []
    state = pol
    key = jax.random.key(1)
    shifts = list(range(0, n_frames))
    for i in shifts:
        t_new = dt * jnp.arange(i, i + horizon)
        state = fam.update_timesteps(state, t_new, anneal=1.0)
        key, k = jax.random.split(key)
        samp, _ = fam.sample(state, k, 8)
        mean = fam.predict_mean(state)
        fig, ax = plt.subplots(figsize=(7, 3))
        ax.plot(t_long, np.asarray(u_d(jnp.asarray(t_long))), "k--", lw=1)
        ax.plot(np.asarray(t_new), np.asarray(samp[:, :, 0]).T, "c-",
                alpha=0.4)
        ax.plot(np.asarray(t_new), np.asarray(mean[:, 0]), "b.-")
        ax.set_xlim(float(t_long[0]) - dt, float(t_long[-1]) + dt)
        ax.set_ylim(-0.4, 1.4)
        ax.set_title(f"GP window shift: t in [{float(t_new[0]):.2f}, "
                     f"{float(t_new[-1]):.2f}]")
        frames.append(_rasterize(fig))
    return _gif(out / "policy_time_shift.gif", frames, fps=8)


def anim_policy_time_resolution(out: Path, n_frames: int = 24):
    """The function-space prior evaluated at increasingly fine time
    resolution: kernel policies predict at ANY grid through the prior
    cross-covariance (reference: viz/policy_time_resolution.py)."""
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fam, pol, t, dt, u_d = _fit_tracking_gp()
    frames = []
    resolutions = np.linspace(8, 240, n_frames).astype(int)
    for n_res in resolutions:
        t_res = jnp.linspace(float(t[0]), float(t[-1]), int(n_res))
        # posterior mean on the new grid through the cross-covariance
        k_xt = fam.k(pol, t_res, pol.t)
        sol = jnp.linalg.solve(pol.cov_prior
                               + 1e-8 * jnp.eye(t.shape[0]), pol.mean)
        mean_res = pol.mean_fn[None, :] + k_xt @ sol
        fig, ax = plt.subplots(figsize=(7, 3))
        ax.plot(np.asarray(t), np.asarray(u_d(t)), "k--", lw=1)
        ax.plot(np.asarray(t_res), np.asarray(mean_res[:, 0]), "b.-",
                ms=3)
        ax.set_ylim(-0.4, 1.4)
        ax.set_title(f"GP prediction at {int(n_res)} points "
                     f"(fitted on {t.shape[0]})")
        frames.append(_rasterize(fig))
    return _gif(out / "policy_time_resolution.gif", frames, fps=8)


ANIMATIONS = {
    "gaussian_ppi": anim_gaussian_ppi,
    "nonlinear_ppi": anim_nonlinear_ppi,
    "policy_time_shift": anim_policy_time_shift,
    "policy_time_resolution": anim_policy_time_resolution,
}


def main(args):
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    which = ANIMATIONS if args.which == "all" else {
        args.which: ANIMATIONS[args.which]}
    for name, fn in which.items():
        path = fn(out)
        print(f"wrote {path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="figures")
    p.add_argument("--which", default="all",
                   choices=["all"] + sorted(ANIMATIONS))
    main(p.parse_args())
