"""Batched on-device rigid-body physics.

The TPU-native replacement for the reference's out-of-process MuJoCo workers
(SURVEY.md §2 "Native / non-Python components"): generalized-coordinate
articulated dynamics as pure JAX functions — `vmap` over thousands of
rollouts, `lax.scan` over time, penalty contacts, autodiff Coriolis terms.
"""

from ppi_tpu.envs.physics.engine import (
    ArticulatedModel,
    ModelBuilder,
    PhysicsState,
    forward_dynamics,
    fk,
    mass_matrix,
    step,
)
