"""Environments: analytic test functions, the batched physics core, and the
task environments built on it."""

from ppi_tpu.envs import functions  # noqa: F401
