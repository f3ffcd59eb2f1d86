"""Experiment I/O: exists-guard, args snapshots, checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.policies.gaussian import Gaussian
from ppi_tpu.utils import (experiment_dir, load_checkpoint, save_checkpoint,
                           save_results, write_args)


class TestExperimentDir:
    def test_exists_guard(self, tmp_path):
        d = experiment_dir(tmp_path, "exp1")
        assert d is not None
        save_results(d, costs=np.arange(3.0))
        assert experiment_dir(tmp_path, "exp1") is None          # guarded
        assert experiment_dir(tmp_path, "exp1", force=True) is not None

    def test_write_args(self, tmp_path):
        import argparse
        ns = argparse.Namespace(alpha=1.5, name="x", flag=True)
        write_args(ns, tmp_path)
        import json
        data = json.loads((tmp_path / "args.json").read_text())
        assert data["alpha"] == 1.5 and data["flag"] is True


class TestCheckpoint:
    def test_roundtrip_policy_state(self, tmp_path):
        """Checkpoint/resume: the whole run state is a small pytree
        (SURVEY.md §5 gap the reference lacks)."""
        fam = Gaussian(dim=3)
        state = fam.init(jnp.array([1.0, 2.0, 3.0]), 0.5 * jnp.eye(3))
        key = jax.random.key(42)
        path = tmp_path / "ckpt.npz"
        save_checkpoint(path, (state, key), step=7)
        (restored, rkey), step = load_checkpoint(path, (state, key))
        assert step == 7
        np.testing.assert_allclose(restored.mu, state.mu)
        np.testing.assert_allclose(restored.sigma, state.sigma)
        # the PRNG key restores bit-exactly
        a = jax.random.normal(key, (4,))
        b = jax.random.normal(rkey, (4,))
        np.testing.assert_allclose(a, b)
