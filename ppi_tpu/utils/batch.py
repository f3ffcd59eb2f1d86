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
            pad = jnp.broadcast_to(ks[-1:], (chunk - ks.shape[0],))
            ks = jnp.concatenate([ks, pad])
        out = prog(ks)
        parts.append(jax.tree.map(
            lambda x, m=min(chunk, n - i): x[:m], out))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
