"""Multi-chip scale-out of the sample axis over a device mesh."""

from ppi_tpu.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    sample_sharding,
    shard_batch,
    sharded_mpc_objective,
    sharded_objective,
)
