"""Experiment I/O, logging, and checkpointing utilities."""

from ppi_tpu.utils.io import (
    experiment_dir,
    load_checkpoint,
    save_checkpoint,
    save_results,
    write_args,
)
from ppi_tpu.utils.logs import setup_logging
