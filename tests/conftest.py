"""Test harness configuration.

Runs the suite on CPU with 8 virtual devices so multi-chip sharding paths can
be exercised without TPU hardware (SURVEY.md §4e: the TPU-native answer to
"test multi-node without a cluster").

NOTE: this image pre-imports the axon TPU plugin at interpreter startup, so
platform selection must go through ``jax.config`` (environment variables are
read before conftest runs). Set PPI_TPU_TEST_PLATFORM=tpu to run on device.
"""

import os

import jax

_platform = os.environ.get("PPI_TPU_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)
if _platform == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the scalar-SoA physics graphs compile in
# seconds-to-tens-of-seconds; caching makes repeated test runs cheap.
from ppi_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop jit caches between test modules.

    Every compiled XLA:CPU executable holds mmap'd JIT code regions; a
    single pytest process compiles thousands of programs over the full
    suite and the host caps vm.max_map_count at 65530. Measured: the map
    count grows ~linearly to ~65k by ~92% of the suite, at which point
    LLVM's memory manager segfaults on a failed mmap (observed twice,
    deterministically, in tests/test_policies.py once the suite grew past
    ~240 tests). Clearing between modules bounds live executables to one
    module's worth; the persistent disk cache keeps recompiles cheap."""
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
