"""Offline expert-dataset ingestion (D4RL-format HDF5 and npz logs).

The reference's model-selection pipeline pulls its expert action windows
from D4RL datasets via ``gym.make(name).get_dataset()`` (reference:
mpc/model_selection/extract_mavn.py:103-116): flat ``actions``/``rewards``/
``terminals`` arrays, carved into fixed-length-1000 episodes and truncated
to the fit horizon. D4RL's on-disk format is a plain HDF5 file with those
same keys, so the TPU-native rebuild ingests the files directly (no gym /
d4rl / mujoco import chain) and hands host-side numpy windows to the jitted
moment-extraction pipeline (``model_selection.select_model``) in one
device transfer.

Two episode-carving modes:

* ``episode_length=N`` — the reference's behavior verbatim (extract_mavn.py
  :109-116): assume fixed-length episodes back to back in the flat stream.
* ``episode_length=None`` — split on ``terminals | timeouts`` flags (the
  D4RL schema's actual episode boundaries); episodes shorter than the fit
  horizon are dropped, longer ones truncated. This is the honest mode for
  datasets whose episodes end early (e.g. adroit-human tasks).

``h5py`` is imported lazily and gated so the module stays importable on
images without it.
"""

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class ExpertDataset:
    """Windowed expert data ready for moment extraction.

    actions: (n_episodes, horizon, d_a); rewards: (n_episodes, horizon)
    (zeros when the source has no rewards key).
    """

    actions: np.ndarray
    rewards: np.ndarray

    @property
    def n_episodes(self):
        return self.actions.shape[0]

    @property
    def returns(self):
        return self.rewards.sum(axis=1)


def _episode_starts(n, terminals, timeouts, episode_length):
    """Episode start indices in a flat (n, ...) D4RL stream."""
    if episode_length is not None:
        return np.arange(0, n - episode_length + 1, episode_length), \
            episode_length
    done = np.zeros(n, dtype=bool)
    if terminals is not None:
        done |= np.asarray(terminals, dtype=bool)
    if timeouts is not None:
        done |= np.asarray(timeouts, dtype=bool)
    ends = np.flatnonzero(done)
    starts = np.concatenate([[0], ends + 1])
    starts = starts[starts < n]
    lengths = np.diff(np.concatenate([starts, [n]]))
    return starts, lengths


def carve_episodes(actions, rewards=None, terminals=None, timeouts=None,
                   horizon: int = 250, episode_length=1000,
                   max_episodes=None):
    """Carve a flat D4RL stream into (n_b, horizon, d_a) action windows.

    Mirrors reference extract_mavn.py:103-116 when ``episode_length`` is an
    int; splits on done flags when it is None. Episodes shorter than
    ``horizon`` are dropped (the reference would silently read across
    episode boundaries there — a bug not reproduced).
    """
    actions = np.asarray(actions)
    n, d_a = actions.shape
    starts, lengths = _episode_starts(n, terminals, timeouts, episode_length)
    lengths = np.broadcast_to(lengths, starts.shape)
    keep = lengths >= horizon
    starts = starts[keep]
    if max_episodes is not None:
        starts = starts[:max_episodes]
    if starts.size == 0:
        raise ValueError(
            f"no episodes of length >= horizon={horizon} in stream of {n} "
            "steps — lower --horizon or check episode_length")
    win_a = np.stack([actions[s:s + horizon] for s in starts])
    if rewards is not None:
        rewards = np.asarray(rewards)
        win_r = np.stack([rewards[s:s + horizon] for s in starts])
    else:
        win_r = np.zeros(win_a.shape[:2], dtype=actions.dtype)
    return ExpertDataset(actions=win_a, rewards=win_r)


def load_d4rl_hdf5(path, horizon: int = 250, episode_length=1000,
                   max_episodes=None, clip_to=None):
    """Load a D4RL-format HDF5 file into an :class:`ExpertDataset`.

    Reads the schema keys ``actions`` (required), ``rewards``,
    ``terminals``, ``timeouts`` (optional). ``clip_to=(low, high)``
    applies the reference's Limiter (extract_mavn.py:58-63) so
    out-of-range logged actions cannot corrupt the MLE.
    """
    try:
        import h5py
    except ImportError as e:  # pragma: no cover - image has h5py
        raise ImportError(
            "D4RL ingestion needs h5py; install it or convert the dataset "
            "to npz with keys actions/rewards/terminals") from e
    with h5py.File(path, "r") as f:
        if "actions" not in f:
            raise KeyError(f"{path} has no 'actions' dataset "
                           f"(keys: {sorted(f.keys())})")
        actions = f["actions"][()]
        rewards = f["rewards"][()] if "rewards" in f else None
        terminals = f["terminals"][()] if "terminals" in f else None
        timeouts = f["timeouts"][()] if "timeouts" in f else None
    if clip_to is not None:
        actions = np.clip(actions, clip_to[0], clip_to[1])
    return carve_episodes(actions, rewards, terminals, timeouts,
                          horizon=horizon, episode_length=episode_length,
                          max_episodes=max_episodes)


def load_expert_npz(path, horizon: int = 250, max_episodes=None):
    """Load a ``runners.collect_expert`` npz log ((T, d_a) or already
    (n_b, T, d_a)) into an :class:`ExpertDataset`."""
    data = np.load(path)
    actions = np.asarray(data["actions"])
    rewards = np.asarray(data["rewards"]) if "rewards" in data.files else None
    if actions.ndim == 2:
        ep_len = (int(data["episode_length"])
                  if "episode_length" in data.files else actions.shape[0])
        return carve_episodes(actions, rewards, horizon=horizon,
                              episode_length=ep_len,
                              max_episodes=max_episodes)
    if max_episodes is not None:
        actions = actions[:max_episodes]
        rewards = None if rewards is None else rewards[:max_episodes]
    if actions.shape[1] < horizon:
        raise ValueError(f"episodes of length {actions.shape[1]} < "
                         f"horizon {horizon}")
    win_a = actions[:, :horizon]
    win_r = (np.zeros(win_a.shape[:2], dtype=win_a.dtype)
             if rewards is None else rewards[:, :horizon])
    return ExpertDataset(actions=win_a, rewards=win_r)


def dataset_stats(ds: ExpertDataset, dt: float) -> dict:
    """Return/smoothness percentiles the reference prints while extracting
    (extract_mavn.py:118-145) — FFT smoothness via the jitted metric."""
    import jax

    from ppi_tpu.mpc.metrics import fft_smoothness
    rets = ds.returns
    sm_fn = jax.jit(jax.vmap(lambda a: fft_smoothness(a, dt)[0]))
    sm = np.asarray(sm_fn(ds.actions))
    pct = [25, 50, 75]
    return {
        "n_episodes": int(ds.n_episodes),
        "returns_pct": np.percentile(rets, pct).tolist(),
        "smoothness_pct": np.percentile(sm, pct).tolist(),
    }
