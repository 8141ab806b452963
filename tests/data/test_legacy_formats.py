"""Legacy reference trajectory formats: flat-array npz and pickled lists.

The reference's pre-HF formats (reference data/serialize.py:45-72): npz with
concatenated fields + split indices, and pickled Trajectory lists. We load
both — including the real artifact committed in the reference repo.
"""

import dataclasses
import os
import pickle
import sys
import types as pytypes

import numpy as np
import pytest

from imitation_tpu.data import serialize, types

REFERENCE_NPZ = (
    "/root/reference/tests/testdata/expert_models/pendulum_0/rollouts/"
    "final.npz"
)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_NPZ), reason="reference artifact not present"
)
def test_loads_real_reference_npz_rollouts():
    with pytest.warns(DeprecationWarning):
        trajs = serialize.load(REFERENCE_NPZ)
    assert len(trajs) == 56
    for t in trajs:
        assert isinstance(t, types.TrajectoryWithRew)
        assert len(t.obs) == len(t.acts) + 1
        assert len(t.rews) == len(t.acts)
    # Pendulum returns are negative and bounded
    rets = [t.rews.sum() for t in trajs]
    assert all(-2000 < r <= 0 for r in rets)


def test_reference_npz_format_roundtrip(tmp_path):
    """Synthesize the reference's flat npz layout and decode it."""
    rng = np.random.default_rng(0)
    lens = [3, 5, 2]
    obs = rng.normal(size=(sum(lens) + len(lens), 4)).astype(np.float32)
    acts = rng.normal(size=(sum(lens), 2)).astype(np.float32)
    rews = rng.normal(size=(sum(lens),))
    indices = np.cumsum(lens)[:-1]
    path = str(tmp_path / "old.npz")
    np.savez(
        path,
        obs=obs,
        acts=acts,
        rews=rews,
        infos=np.array([{} for _ in range(sum(lens))], dtype=object),
        terminal=np.array([True, False, True]),
        indices=indices,
    )
    with pytest.warns(DeprecationWarning):
        trajs = serialize.load(path)
    assert [len(t.acts) for t in trajs] == lens
    assert [len(t.obs) for t in trajs] == [n + 1 for n in lens]
    assert [t.terminal for t in trajs] == [True, False, True]
    np.testing.assert_allclose(trajs[1].acts, acts[3:8])
    np.testing.assert_allclose(trajs[1].obs, obs[4:10])


def test_reference_pickle_format(tmp_path):
    """A pickle stream referencing the reference's class paths resolves to
    our Trajectory types by name."""

    @dataclasses.dataclass(frozen=True)
    class TrajectoryWithRew:
        obs: np.ndarray
        acts: np.ndarray
        infos: object
        terminal: bool
        rews: np.ndarray

    fake_mod = pytypes.ModuleType("imitation.data.types")
    fake_mod.TrajectoryWithRew = TrajectoryWithRew
    TrajectoryWithRew.__module__ = "imitation.data.types"
    TrajectoryWithRew.__qualname__ = "TrajectoryWithRew"
    sys.modules.setdefault("imitation", pytypes.ModuleType("imitation"))
    sys.modules.setdefault(
        "imitation.data", pytypes.ModuleType("imitation.data")
    )
    sys.modules["imitation.data.types"] = fake_mod
    try:
        t = TrajectoryWithRew(
            obs=np.zeros((4, 3), np.float32),
            acts=np.zeros((3, 1), np.float32),
            infos=None,
            terminal=True,
            rews=np.ones(3),
        )
        path = str(tmp_path / "old.pkl")
        with open(path, "wb") as f:
            pickle.dump([t, t], f)
    finally:
        del sys.modules["imitation.data.types"]

    with pytest.warns(DeprecationWarning):
        trajs = serialize.load(path)
    assert len(trajs) == 2
    assert isinstance(trajs[0], types.TrajectoryWithRew)
    assert len(trajs[0].obs) == 4


def test_lfs_pointer_error(tmp_path):
    path = str(tmp_path / "ptr.pkl")
    with open(path, "wb") as f:
        f.write(b"version https://git-lfs.github.com/spec/v1\n")
    with pytest.raises(ValueError, match="git-lfs pointer"):
        with pytest.warns(DeprecationWarning):
            serialize.load(path)
