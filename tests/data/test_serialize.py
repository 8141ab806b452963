"""Trajectory serialization tests (reference tests/data/test_serialize +
huggingface round trips)."""

import numpy as np
import pytest

from imitation_tpu.data import huggingface_utils, serialize, types


def make_trajs(n=3):
    out = []
    for i in range(2, 2 + n):
        out.append(
            types.TrajectoryWithRew(
                obs=np.arange((i + 1) * 2, dtype=np.float32).reshape(i + 1, 2),
                acts=np.arange(i, dtype=np.int64),
                rews=np.linspace(0, 1, i).astype(np.float64),
                infos=np.array([{"step": t} for t in range(i)]),
                terminal=(i % 2 == 0),
            )
        )
    return out


def test_save_load_roundtrip(tmp_path):
    trajs = make_trajs()
    path = str(tmp_path / "rollouts")
    serialize.save(path, trajs)
    loaded = serialize.load(path)
    assert len(loaded) == len(trajs)
    for a, b in zip(trajs, loaded):
        np.testing.assert_array_equal(a.obs, b.obs)
        np.testing.assert_array_equal(a.acts, b.acts)
        np.testing.assert_allclose(a.rews, b.rews)
        assert a.terminal == b.terminal


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        serialize.load(str(tmp_path / "nope"))


def test_npz_fallback_roundtrip(tmp_path):
    trajs = make_trajs()
    path = str(tmp_path / "npz_rollouts")
    serialize._save_npz(path, trajs)
    loaded = serialize.load(path)
    assert len(loaded) == len(trajs)
    np.testing.assert_array_equal(loaded[0].acts, trajs[0].acts)


def test_hf_dataset_sequence():
    trajs = make_trajs(4)
    ds = huggingface_utils.trajectories_to_dataset(trajs)
    seq = huggingface_utils.TrajectoryDatasetSequence(ds)
    assert len(seq) == 4
    t = seq[1]
    assert isinstance(t, types.TrajectoryWithRew)
    np.testing.assert_array_equal(t.acts, trajs[1].acts)
    # infos decoded from json
    assert t.infos[0]["step"] == 0
    # slicing + negative indexing
    assert len(seq[1:3]) == 2
    np.testing.assert_array_equal(seq[-1].acts, trajs[-1].acts)


def test_reference_format_compat(tmp_path):
    """A dataset written by this library exposes the reference's columns."""
    trajs = make_trajs(2)
    path = str(tmp_path / "compat")
    serialize.save(path, trajs)
    import datasets

    ds = datasets.load_from_disk(path)
    assert set(ds.column_names) >= {"obs", "acts", "rews", "terminal", "infos"}
