"""Minimal rotation utilities for the physics core."""

import jax.numpy as jnp


def rodrigues(axis: jnp.ndarray, angle) -> jnp.ndarray:
    """Rotation matrix about a unit axis by angle (Rodrigues' formula)."""
    x, y, z = axis[0], axis[1], axis[2]
    k = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * k + (1.0 - c) * (k @ k)


def rpy_matrix(roll: float, pitch: float, yaw: float) -> jnp.ndarray:
    """Fixed-axis roll-pitch-yaw rotation (URDF convention)."""
    rx = rodrigues(jnp.array([1.0, 0.0, 0.0]), roll)
    ry = rodrigues(jnp.array([0.0, 1.0, 0.0]), pitch)
    rz = rodrigues(jnp.array([0.0, 0.0, 1.0]), yaw)
    return rz @ ry @ rx
