"""BC with dict observations (reference multi_obs_venv tests,
tests/algorithms/conftest.py:109-115)."""

import jax
import numpy as np

from imitation_tpu.algorithms.bc import BC
from imitation_tpu.data import types
from imitation_tpu.envs.base import DictSpace, Space


def make_dict_demos(n=64):
    rng = np.random.default_rng(0)
    obs = {
        "pos": rng.normal(size=(n, 3)).astype(np.float32),
        "vel": rng.normal(size=(n, 2)).astype(np.float32),
    }
    # action correlated with obs so BC has something to learn
    acts = (obs["pos"][:, 0] > 0).astype(np.int64)
    return types.TransitionsMinimal(
        obs=types.DictObs(obs), acts=acts, infos=np.array([{}] * n)
    )


def test_bc_trains_on_dict_obs():
    obs_space = DictSpace(
        spaces={
            "pos": Space.box(-10, 10, (3,)),
            "vel": Space.box(-10, 10, (2,)),
        }
    )
    act_space = Space.discrete(2)
    demos = make_dict_demos()
    bc = BC(
        observation_space=obs_space,
        action_space=act_space,
        demonstrations=demos,
        rng=0,
        batch_size=16,
    )
    bc.train(n_epochs=20)
    # learned the decision rule: accuracy on training obs is high
    variables = bc.state.variables
    obs_dev = {
        "pos": np.asarray(demos.obs.get("pos")),
        "vel": np.asarray(demos.obs.get("vel")),
    }
    import jax.numpy as jnp

    dist = bc.policy.distribution(variables, jax.tree.map(jnp.asarray, obs_dev))
    preds = np.asarray(dist.mode())
    acc = (preds == np.asarray(demos.acts)).mean()
    assert acc > 0.9, f"accuracy {acc}"


def test_dict_space_flat_dim():
    ds = DictSpace(spaces={"a": Space.box(-1, 1, (3,)), "b": Space.discrete(4)})
    assert ds.flat_dim == 7
    assert not ds.is_discrete
