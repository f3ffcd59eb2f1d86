"""Experiment I/O: exists-guarded result dirs, args snapshots, npz results,
and pytree checkpointing.

Counterpart of the reference's utils (reference: utils.py:9-31; exists-guard
pattern at run_mpc.py:104-108) plus the checkpoint/resume capability the
reference lacks (SURVEY.md §5 "Checkpoint / resume"): since all run state is
a small pytree (policy moments + PRNG key + iteration index), a checkpoint is
one npz file.
"""

import dataclasses
import json
import logging
from pathlib import Path

import jax
import numpy as np


def experiment_dir(base_dir, name: str, force: bool = False):
    """Create (or reuse) an experiment directory with the reference's
    exists-guard semantics: if results exist and force is False, return None
    to signal "already done"."""
    path = Path(base_dir) / name
    path.mkdir(parents=True, exist_ok=True)
    if (path / "data.npz").exists() and not force:
        return None
    return path


def write_args(args, path: Path):
    """Snapshot run arguments next to the results (args.json; the reference
    uses YAML — JSON keeps us dependency-free and diff-able)."""
    if path is None:
        return
    if dataclasses.is_dataclass(args):
        payload = dataclasses.asdict(args)
    elif hasattr(args, "__dict__"):
        payload = dict(vars(args))
    else:
        payload = dict(args)
    payload = {k: (v if isinstance(v, (int, float, str, bool, type(None)))
                   else str(v)) for k, v in payload.items()}
    (Path(path) / "args.json").write_text(json.dumps(payload, indent=2) + "\n")


def save_results(path, **arrays):
    if path is None:
        return
    np.savez(Path(path) / "data.npz",
             **{k: np.asarray(v) for k, v in arrays.items()})
    logging.info("results -> %s", Path(path) / "data.npz")


def _is_prng_key(leaf) -> bool:
    return hasattr(leaf, "dtype") and jax.numpy.issubdtype(
        leaf.dtype, jax.dtypes.prng_key)


def save_checkpoint(path, tree, step: int = 0):
    """Serialize any pytree (policy state, PRNG key, counters) to one npz.
    Typed PRNG keys are stored as their underlying key data."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {}
    for i, leaf in enumerate(leaves):
        if _is_prng_key(leaf):
            payload[f"key_{i}"] = np.asarray(jax.random.key_data(leaf))
        else:
            payload[f"leaf_{i}"] = np.asarray(leaf)
    payload["__step"] = np.asarray(step)
    np.savez(Path(path), **payload)
    return treedef


def load_checkpoint(path, like_tree):
    """Restore a pytree checkpoint into the structure of ``like_tree``."""
    data = np.load(Path(path))
    leaves, treedef = jax.tree_util.tree_flatten(like_tree)
    restored = []
    for i, like in enumerate(leaves):
        if f"key_{i}" in data:
            restored.append(jax.random.wrap_key_data(
                jax.numpy.asarray(data[f"key_{i}"])))
        else:
            restored.append(jax.numpy.asarray(data[f"leaf_{i}"]))
    step = int(data["__step"])
    return jax.tree_util.tree_unflatten(treedef, restored), step
