"""ppi_tpu — a TPU-native Monte Carlo Posterior Policy Iteration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
JoeMWatson/monte-carlo-posterior-policy-iteration (CoRL'22, arXiv:2210.03512):
Gibbs-posterior policy iteration with Gaussian-process / feature / noise priors,
driving batched on-device physics rollouts for episodic policy search and
receding-horizon MPC.

Design principles (vs. the reference's NumPy + multiprocessing + MuJoCo-C stack):
  * every policy/solver is a pure function over pytree state — the whole
    sample -> rollout -> weight -> moment-match iteration is one jitted program;
  * the sample axis is `vmap`-batched on one chip and promoted to a named
    `shard_map` mesh axis for multi-chip scale-out (ICI collectives, no queues);
  * physics is an on-device batched rigid-body core (`ppi_tpu.envs.physics`)
    instead of out-of-process MuJoCo workers;
  * SciPy's L-BFGS-B/Brent temperature searches are replaced with in-graph
    vectorized grid+golden-section / bisection solvers (`ppi_tpu.ops.scalar_opt`).
"""

__version__ = "0.1.0"

from ppi_tpu import ops  # noqa: F401
