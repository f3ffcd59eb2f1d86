"""Offline prior fitting (model selection).

Counterpart of the reference's model-selection pipeline (reference:
mpc/model_selection/extract_mavn.py, model_selection.py):

  1. ``extract_matrix_normal_moments`` — fit a matrix-normal distribution to
     windows of expert action data via the iterated flip-flop MLE
     (reference: extract_mavn.py:176-184 uses m_projection_mavn with 5
     iterations and update_out=True);
  2. ``fit_kernel_hyperparams`` — fit a kernel's hyperparameters so its gram
     matrix matches a target input covariance in Gaussian KL; the reference
     uses autograd + SciPy L-BFGS-B (model_selection.py:127-154), here the
     objective is differentiated with ``jax.grad`` and minimized with
     in-graph Adam — fully on device.

The fitted (mean, covariance_out, kernel params) tuples feed run_mpc the way
``model_selection.npz`` does in the reference (run_mpc.py:53-61).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu import ops


def action_windows(actions: jnp.ndarray, horizon: int, stride: int = 1):
    """Slice an expert action log (T, d_a) into (N, horizon, d_a) windows."""
    t = actions.shape[0]
    starts = np.arange(0, t - horizon + 1, stride)
    return jnp.stack([actions[s:s + horizon] for s in starts])


def extract_matrix_normal_moments(windows: jnp.ndarray, iterations: int = 5):
    """Unweighted matrix-normal MLE over expert action windows.

    Returns (mean (H, d_a), covariance_in (H, H), covariance_out (d_a, d_a)).
    """
    n, h, d_a = windows.shape
    log_w = jnp.zeros(n)
    mean, cov_in, cov_out, _ = ops.m_projection_mavn(
        log_w, windows, jnp.eye(h), jnp.eye(d_a),
        iterations=iterations, update_out=True)
    return mean, cov_in, cov_out


@partial(jax.jit, static_argnames=("kernel_fn", "steps"))
def fit_kernel_hyperparams(kernel_fn, t, target_cov, hyper0,
                           lr: float = 0.05, steps: int = 1500):
    """Minimize KL( N(0, target) || N(0, K_hyper(t, t)) ) over log-params.

    kernel_fn(hyper, t1, t2) -> gram matrix (the functions in
    ppi_tpu.policies.kernels). Log-parameterization keeps hyper > 0 without
    box constraints. Returns (hyper_opt, kl_final).
    """
    h = t.shape[0]
    zero = jnp.zeros(h)

    def objective(log_hyper):
        cov = kernel_fn(jnp.exp(log_hyper), t, t)
        return ops.multivariate_gaussian_kl(zero, target_cov, zero, cov)

    grad_fn = jax.value_and_grad(objective)

    def body(carry, _):
        x, m, v, i = carry
        val, g = grad_fn(x)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1.0 - 0.9 ** (i + 1))
        vhat = v / (1.0 - 0.999 ** (i + 1))
        x = x - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
        return (x, m, v, i + 1), val

    x0 = jnp.log(hyper0)
    (x, _, _, _), vals = jax.lax.scan(
        body, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), 0), None,
        length=steps)
    return jnp.exp(x), vals[-1]


def default_kernels(dt: float) -> dict:
    """The kernel families fitted by default, keyed by POLICY name so the
    artifact plugs straight into run_mpc --model-selection (the reference
    fits SE/periodic/white per env; reference: model_selection.py:55-99)."""
    from ppi_tpu.policies.kernels import (
        k_matern32, k_matern52, k_periodic, k_squared_exponential)
    ls0 = 5.0 * dt
    return {
        "SquaredExponentialKernel": (k_squared_exponential, (1.0, ls0)),
        "Matern32Kernel": (k_matern32, (1.0, ls0)),
        "Matern52Kernel": (k_matern52, (1.0, ls0)),
        "PeriodicKernel": (k_periodic, (1.0, ls0, 20.0 * dt)),
    }


def select_model(expert_actions, horizon: int, kernels: dict, t=None):
    """Full pipeline: expert data -> MN moments -> best-KL kernel per family.

    kernels: {name: (kernel_fn, hyper0)}. Returns a dict like the reference's
    model_selection.npz payload: per kernel name a dict with mean,
    covariance_out, param, kl.
    """
    expert_actions = jnp.asarray(expert_actions)
    if expert_actions.ndim == 3:
        # pre-windowed (n_b, horizon, d_a) episodes — the D4RL ingestion
        # path (datasets.load_d4rl_hdf5), matching the reference's
        # episode-carved batches (extract_mavn.py:109-116)
        windows = expert_actions[:, :horizon]
    else:
        windows = action_windows(expert_actions, horizon)
    mean, cov_in, cov_out = extract_matrix_normal_moments(windows)
    if t is None:
        t = jnp.arange(horizon, dtype=jnp.float32)
    out = {}
    for name, (kernel_fn, hyper0) in kernels.items():
        hyper, kl = fit_kernel_hyperparams(kernel_fn, t, cov_in,
                                           jnp.asarray(hyper0))
        out[name] = {
            "mean": np.asarray(mean.mean(axis=0)),
            "covariance_out": np.asarray(cov_out),
            "param": np.asarray(hyper),
            "kl": float(kl),
        }
    return out


def save_model_selection(path, payload: dict):
    """Write a {policy_name: {mean, covariance_out, param, kl}} payload as
    npz — the counterpart of the reference's model_selection.npz artifact
    (reference: model_selection.py:163-175, consumed at run_mpc.py:53-61)."""
    np.savez(path, **{name: np.asarray(entry, dtype=object)
                      for name, entry in payload.items()})


def load_model_selection(path) -> dict:
    data = np.load(path, allow_pickle=True)
    return {name: data[name].item() for name in data.files}


def main(args):
    dt = float(args.dt)
    if getattr(args, "d4rl", None):
        from ppi_tpu.datasets import dataset_stats, load_d4rl_hdf5
        ds = load_d4rl_hdf5(
            args.d4rl, horizon=args.horizon,
            episode_length=(args.episode_length or None),
            max_episodes=args.max_episodes)
        stats = dataset_stats(ds, dt)
        print(f"d4rl: {stats['n_episodes']} episodes, "
              f"returns pct25/50/75 = {np.round(stats['returns_pct'], 2)}, "
              f"smoothness = {np.round(stats['smoothness_pct'], 3)}")
        actions = ds.actions
    else:
        data = np.load(args.expert)
        actions = data["actions"]
    t = dt * jnp.arange(args.horizon)
    payload = select_model(actions, args.horizon, default_kernels(dt), t=t)
    for name, entry in payload.items():
        print(f"{name}: param={np.round(entry['param'], 4)} "
              f"kl={entry['kl']:.4f}")
    save_model_selection(args.out, payload)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(
        description="Fit matrix-normal moments + kernel hyperparameters to "
                    "expert action data (the reference's extract_mavn + "
                    "model_selection pipeline in one step).")
    p.add_argument("--expert",
                   help="npz with an 'actions' (T, d_a) array "
                        "(from runners.collect_expert)")
    p.add_argument("--d4rl",
                   help="D4RL-format HDF5 dataset (actions/rewards/"
                        "terminals); ingested directly, no gym/d4rl "
                        "import chain (reference: extract_mavn.py:103-116)")
    p.add_argument("--episode-length", type=int, default=1000,
                   help="fixed episode length in the flat stream "
                        "(reference default); 0 = split on terminals/"
                        "timeouts instead")
    p.add_argument("--max-episodes", type=int, default=None)
    p.add_argument("--horizon", type=int, default=30)
    p.add_argument("--dt", type=float, default=0.02)
    p.add_argument("--out", default="model_selection.npz")
    _args = p.parse_args()
    if not (_args.expert or _args.d4rl):
        p.error("one of --expert / --d4rl is required")
    main(_args)
