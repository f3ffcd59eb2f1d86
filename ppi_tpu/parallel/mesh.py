"""Sample-axis data parallelism over a `jax.sharding.Mesh`.

The reference's only parallel axis is the *sample* axis, implemented as a
process pool with pickled per-sample messages (reference:
mpc/wrappers.py:19-26, 121-189; SURVEY.md §2 parallelism inventory). The
TPU-native replacement: the sample axis becomes a named mesh axis. Sampled
action sequences are sharding-constrained to it, the vmapped rollouts
partition embarrassingly, and the moment-match einsums of the posterior
update contract over the sharded axis — XLA inserts the psum/all-reduce over
ICI automatically (the "annotate shardings, let the compiler place
collectives" recipe). No queues, no pickling, no communication code.

Multi-axis layouts (e.g. samples x model for giant horizons) would slot in
here; the workloads in scope are sample-parallel only, matching the
reference's parallelism story.

For multi-slice deployments (several ICI-connected slices joined by DCN),
``make_multislice_mesh`` builds a 2-D ``(slices, samples)`` mesh whose
*major* axis strides across slices: sharding the sample batch over
``("slices", "samples")`` keeps each contiguous sub-batch on one slice, so
the moment-match all-reduce decomposes into a fast intra-slice ICI stage
and a single small inter-slice DCN stage (XLA's reduction over a 2-D mesh
axis pair is hierarchical by device order — the standard multi-slice
recipe). On a single pod the same code degrades to the 1-D layout.
"""

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "samples"
SLICE_AXIS = "slices"


def make_mesh(n_devices: Optional[int] = None, axis: str = SAMPLE_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all).

    Raises when fewer than ``n_devices`` devices exist — a "multi-chip" mesh
    silently downgraded to one device would let sharding checks pass
    vacuously.
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh(n_devices={n_devices}) but only {len(devs)} "
                f"device(s) are visible on platform "
                f"'{jax.default_backend()}'. For multi-chip validation "
                f"without hardware, force the virtual-CPU platform first: "
                f'jax.config.update("jax_platforms", "cpu"); '
                f'jax.config.update("jax_num_cpu_devices", {n_devices}).')
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_multislice_mesh(n_slices: int, chips_per_slice: int,
                         slice_axis: str = SLICE_AXIS,
                         sample_axis: str = SAMPLE_AXIS) -> Mesh:
    """2-D ``(slices, samples)`` mesh for multi-slice (DCN-joined) pods.

    Device order is taken slice-major: devices ``[i*chips_per_slice :
    (i+1)*chips_per_slice]`` form slice ``i`` (on real multi-slice TPU
    deployments jax.devices() enumerates slice by slice; on the virtual-CPU
    test platform the grouping is synthetic but exercises the identical
    sharding/collective structure). Shard sample batches with
    ``P((slice_axis, sample_axis))`` so each slice owns one contiguous
    sub-batch and cross-slice (DCN) traffic is only the final reduced
    moments, not rollout data.
    """
    n = n_slices * chips_per_slice
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(
            f"make_multislice_mesh({n_slices}x{chips_per_slice}) needs {n} "
            f"devices but only {len(devs)} are visible on platform "
            f"'{jax.default_backend()}'.")
    grid = np.array(devs[:n]).reshape(n_slices, chips_per_slice)
    return Mesh(grid, (slice_axis, sample_axis))


def sample_sharding(mesh: Mesh,
                    axis: Union[str, Sequence[str]] = SAMPLE_AXIS
                    ) -> NamedSharding:
    if not isinstance(axis, str):
        axis = tuple(axis)
    return NamedSharding(mesh, P(axis))


def shard_batch(x, mesh: Mesh, axis: Union[str, Sequence[str]] = SAMPLE_AXIS):
    """Constrain the leading (sample) axis of an array/pytree to the mesh.

    ``axis`` may be a mesh-axis tuple (e.g. ``("slices", "samples")``) to
    shard the batch over a multi-slice mesh hierarchically."""
    sharding = sample_sharding(mesh, axis)

    def constrain(a):
        return jax.lax.with_sharding_constraint(a, sharding)

    return jax.tree_util.tree_map(constrain, x)


def sharded_objective(f, mesh: Mesh,
                      axis: Union[str, Sequence[str]] = SAMPLE_AXIS):
    """Shard the leading (sample) axis of ANY ``(key, actions) -> costs``
    objective over the mesh — the generic counterpart of
    ``sharded_mpc_objective`` for the black-box-optimization and episodic
    policy-search paths (reference parallelism: the per-batch process pool
    at policy_search/ball_in_a_cup.py:466-497 and the batched test
    functions at optimization/functions.py:16-18).

    Constraining the sampled batch is sufficient: XLA propagates the
    sharding backward into the policy's sample transform and forward
    through the evaluation into the solver's weighted-moment contractions,
    which become per-shard partial sums + an all-reduce over ICI.
    Objectives returning ``(costs, aux)`` pass through unchanged.
    """

    def g(key, actions):
        return f(key, shard_batch(actions, mesh, axis))

    return g


def sharded_mpc_objective(env, state0, mesh: Mesh, horizon_mask=None,
                          guard: bool = True,
                          axis: Union[str, Sequence[str]] = SAMPLE_AXIS,
                          risk_quantile: float = 1.0,
                          risk_weight: float = 0.0,
                          unroll: int = 1):
    """``f(key, actions) -> costs`` with the sample axis sharded over the mesh.

    Drop-in replacement for envs.base.mpc_objective for the 16k+-sample sweep
    configuration (SURVEY.md §7 step 9): each device rolls out its shard; the
    solver's weighted-moment contractions all-reduce over ICI. The CVaR risk
    blend (envs.base.risk_aggregate) is per-sample over the horizon axis,
    which is unsharded — it composes with the mesh with no extra collectives.
    """
    from ppi_tpu.envs.base import batch_rollout, risk_aggregate

    def f(key, action_sequences):
        del key
        action_sequences = shard_batch(action_sequences, mesh, axis)
        _, rewards = batch_rollout(env, state0, action_sequences, guard,
                                   unroll)
        return risk_aggregate(rewards, horizon_mask, risk_quantile,
                              risk_weight)

    return f
