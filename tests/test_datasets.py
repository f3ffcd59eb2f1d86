"""D4RL-format dataset ingestion (VERDICT r3 missing #5).

The reference pulls expert windows from D4RL via gym.make().get_dataset()
(reference: mpc/model_selection/extract_mavn.py:103-116); the rebuild reads
the HDF5 schema directly (ppi_tpu/datasets.py) and feeds the jitted moment
pipeline. These tests build synthetic datasets with known episode structure
and check both carving modes plus the end-to-end model-selection fit.
"""

import numpy as np
import pytest

from ppi_tpu.datasets import (
    ExpertDataset,
    carve_episodes,
    dataset_stats,
    load_d4rl_hdf5,
    load_expert_npz,
)

h5py = pytest.importorskip("h5py")


def _write_d4rl(path, n_steps=400, d_a=3, ep_len=100, seed=0):
    rng = np.random.default_rng(seed)
    actions = rng.normal(size=(n_steps, d_a)).astype(np.float32)
    rewards = rng.uniform(size=n_steps).astype(np.float32)
    terminals = np.zeros(n_steps, dtype=bool)
    timeouts = np.zeros(n_steps, dtype=bool)
    timeouts[ep_len - 1::ep_len] = True
    with h5py.File(path, "w") as f:
        f["actions"] = actions
        f["rewards"] = rewards
        f["terminals"] = terminals
        f["timeouts"] = timeouts
    return actions, rewards


def test_fixed_length_carving_matches_reference_layout(tmp_path):
    """episode_length mode reproduces extract_mavn.py:109-116: episode i is
    the slice [i*ep_len, i*ep_len + horizon)."""
    path = tmp_path / "d.hdf5"
    actions, rewards = _write_d4rl(path, n_steps=400, ep_len=100)
    ds = load_d4rl_hdf5(path, horizon=40, episode_length=100)
    assert ds.actions.shape == (4, 40, 3)
    assert ds.rewards.shape == (4, 40)
    for i in range(4):
        np.testing.assert_array_equal(ds.actions[i],
                                      actions[100 * i:100 * i + 40])
        np.testing.assert_array_equal(ds.rewards[i],
                                      rewards[100 * i:100 * i + 40])


def test_done_flag_carving_drops_short_episodes(tmp_path):
    """episode_length=None splits on terminals|timeouts and drops episodes
    shorter than the horizon (never reads across a boundary — the honest
    mode the reference lacks)."""
    path = tmp_path / "d.hdf5"
    rng = np.random.default_rng(1)
    actions = rng.normal(size=(250, 2)).astype(np.float32)
    terminals = np.zeros(250, dtype=bool)
    # episodes: [0,120) [120,150) [150,250)
    terminals[119] = terminals[149] = True
    with h5py.File(path, "w") as f:
        f["actions"] = actions
        f["terminals"] = terminals
    ds = load_d4rl_hdf5(path, horizon=60, episode_length=None)
    assert ds.actions.shape == (2, 60, 2)  # 30-step episode dropped
    np.testing.assert_array_equal(ds.actions[0], actions[0:60])
    np.testing.assert_array_equal(ds.actions[1], actions[150:210])
    # rewards absent -> zeros
    assert ds.rewards.shape == (2, 60)
    assert float(np.abs(ds.rewards).sum()) == 0.0


def test_clip_to_applies_limiter(tmp_path):
    path = tmp_path / "d.hdf5"
    _write_d4rl(path, n_steps=200, ep_len=100, seed=2)
    ds = load_d4rl_hdf5(path, horizon=50, episode_length=100,
                        clip_to=(-0.5, 0.5))
    assert float(np.max(np.abs(ds.actions))) <= 0.5


def test_max_episodes_and_errors(tmp_path):
    path = tmp_path / "d.hdf5"
    _write_d4rl(path, n_steps=400, ep_len=100)
    ds = load_d4rl_hdf5(path, horizon=40, episode_length=100,
                        max_episodes=2)
    assert ds.n_episodes == 2
    with pytest.raises(ValueError):
        carve_episodes(np.zeros((30, 2)), horizon=60, episode_length=None)
    with h5py.File(tmp_path / "bad.hdf5", "w") as f:
        f["observations"] = np.zeros((10, 2))
    with pytest.raises(KeyError):
        load_d4rl_hdf5(tmp_path / "bad.hdf5")


def test_npz_roundtrip_and_stats(tmp_path):
    rng = np.random.default_rng(3)
    actions = rng.normal(size=(300, 2)).astype(np.float32)
    rewards = rng.uniform(size=300).astype(np.float32)
    np.savez(tmp_path / "e.npz", actions=actions, rewards=rewards,
             episode_length=np.asarray(100))
    ds = load_expert_npz(tmp_path / "e.npz", horizon=80)
    assert ds.actions.shape == (3, 80, 2)
    stats = dataset_stats(ds, dt=0.02)
    assert stats["n_episodes"] == 3
    assert np.all(np.isfinite(stats["returns_pct"]))
    assert np.all(np.isfinite(stats["smoothness_pct"]))
    # smoothness percentiles are ordered
    s = stats["smoothness_pct"]
    assert s[0] <= s[1] <= s[2]


def test_d4rl_feeds_model_selection_end_to_end(tmp_path):
    """The ingested windows drive the jitted MN-moment + kernel-KL pipeline
    (select_model accepts pre-windowed (n_b, H, d_a) batches)."""
    from ppi_tpu.model_selection import default_kernels, select_model

    path = tmp_path / "d.hdf5"
    # smooth correlated expert actions so the SE fit is meaningful
    t = np.arange(600) * 0.05
    base = np.stack([np.sin(0.7 * t), np.cos(1.3 * t)], axis=1)
    actions = (base + 0.05 * np.random.default_rng(4).normal(
        size=base.shape)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f["actions"] = actions
        f["rewards"] = np.zeros(600, dtype=np.float32)
    ds = load_d4rl_hdf5(path, horizon=24, episode_length=60)
    assert ds.n_episodes == 10
    kernels = {"SquaredExponentialKernel":
               default_kernels(0.05)["SquaredExponentialKernel"]}
    out = select_model(ds.actions, 24, kernels, t=0.05 * np.arange(24))
    entry = out["SquaredExponentialKernel"]
    assert entry["mean"].shape == (2,)
    assert entry["covariance_out"].shape == (2, 2)
    assert np.isfinite(entry["kl"])
    assert np.all(entry["param"] > 0)


def test_expert_dataset_properties():
    ds = ExpertDataset(actions=np.zeros((5, 10, 2)),
                       rewards=np.ones((5, 10)))
    assert ds.n_episodes == 5
    np.testing.assert_allclose(ds.returns, 10.0)
