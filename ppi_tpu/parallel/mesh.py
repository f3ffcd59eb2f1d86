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
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "samples"


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


def sample_sharding(mesh: Mesh, axis: str = SAMPLE_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(x, mesh: Mesh, axis: str = SAMPLE_AXIS):
    """Constrain the leading (sample) axis of an array/pytree to the mesh."""
    sharding = sample_sharding(mesh, axis)

    def constrain(a):
        return jax.lax.with_sharding_constraint(a, sharding)

    return jax.tree_util.tree_map(constrain, x)


def sharded_mpc_objective(env, state0, mesh: Mesh, horizon_mask=None,
                          guard: bool = True, axis: str = SAMPLE_AXIS):
    """``f(key, actions) -> costs`` with the sample axis sharded over the mesh.

    Drop-in replacement for envs.base.mpc_objective for the 16k+-sample sweep
    configuration (SURVEY.md §7 step 9): each device rolls out its shard; the
    solver's weighted-moment contractions all-reduce over ICI.
    """
    from ppi_tpu.envs.base import batch_rollout

    def f(key, action_sequences):
        del key
        action_sequences = shard_batch(action_sequences, mesh, axis)
        _, rewards = batch_rollout(env, state0, action_sequences, guard)
        if horizon_mask is not None:
            rewards = rewards * horizon_mask[None, :]
        return -jnp.sum(rewards, axis=1)

    return f
