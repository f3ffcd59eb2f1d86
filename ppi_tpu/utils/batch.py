"""Chunked vmap execution over a leading PRNG-key axis.

One jitted vmap(chunk) program is compiled once and reused across chunks;
the tail chunk is padded with a repeated key and trimmed after. Chunking
exists because one XLA:TPU shape (the 13-DoF stacked relocate program at
vmap(5) x T=140) reproducibly kills the TPU worker while every chunked
decomposition of the same computation is fine — see RESULTS.md. Used by
runners/goal_success.py (goal sweeps) and runners/multi_start.py
(solver-seed restarts).
"""

import jax
import jax.numpy as jnp


def sharded_vmap(fn, keys, mesh, axis="samples"):
    """Run ``vmap(fn)`` with the leading key axis SHARDED over ``mesh``.

    Episodes are independent, so constraining the key axis to the mesh
    makes XLA place each shard's episodes on its own device — the
    experiment-throughput scale-out (N resets/restarts in the wall time
    of N/devices), complementing the per-episode sample-axis sharding of
    ``parallel.mesh.sharded_mpc_objective``. The key batch is padded to
    a multiple of the mesh size with a repeated key and trimmed after;
    returns exactly what ``vmap(fn)(keys)`` would.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n = keys.shape[0]
    size = int(mesh.devices.size)
    pad = (-n) % size
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.broadcast_to(keys[-1:], (pad,) + keys.shape[1:])])
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    prog = jax.jit(jax.vmap(fn), in_shardings=sharding)
    out = prog(jax.device_put(keys, sharding))
    return jax.tree.map(lambda x: x[:n], out)


def chunked_vmap(fn, keys, chunk=None):
    """Run ``vmap(fn)`` over the leading axis of ``keys`` in chunks.

    ``chunk=None`` (or >= len(keys)) executes everything as one vmapped
    call. Returns the same pytree a single ``vmap(fn)(keys)`` would.
    """
    n = keys.shape[0]
    chunk = n if chunk is None else max(1, min(chunk, n))
    prog = jax.jit(jax.vmap(fn))
    if chunk == n:
        return prog(keys)
    parts = []
    for i in range(0, n, chunk):
        ks = keys[i:i + chunk]
        if ks.shape[0] < chunk:  # pad to the compiled chunk shape
            pad = jnp.broadcast_to(
                ks[-1:], (chunk - ks.shape[0],) + ks.shape[1:])
            ks = jnp.concatenate([ks, pad])
        out = prog(ks)
        parts.append(jax.tree.map(
            lambda x, m=min(chunk, n - i): x[:m], out))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
