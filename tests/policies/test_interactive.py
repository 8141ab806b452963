"""Interactive policy tests with scripted stdin (reference tests/policies)."""

import collections

import numpy as np
import pytest

from imitation_tpu.envs.base import Space
from imitation_tpu.policies.interactive import (
    DiscreteInteractivePolicy,
    TextInteractivePolicy,
)

OBS = Space.box(-1, 1, (3,))
ACT = Space.discrete(2)


def make_policy(**kwargs):
    return TextInteractivePolicy(
        OBS, ACT,
        collections.OrderedDict([("a", "left"), ("d", "right")]),
        clear_screen_on_query=False,
        **kwargs,
    )


def test_key_count_mismatch_raises():
    with pytest.raises(ValueError, match="one key per action"):
        TextInteractivePolicy(
            OBS, ACT, collections.OrderedDict([("a", "left")]),
        )


def test_continuous_space_raises():
    with pytest.raises(ValueError, match="discrete"):
        TextInteractivePolicy(
            OBS, Space.box(-1, 1, (2,)),
            collections.OrderedDict([("a", "x"), ("b", "y")]),
        )


def test_choose_action_maps_keys(monkeypatch, capsys):
    policy = make_policy()
    inputs = iter(["d", "a"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(inputs))
    act = policy._choose_action(np.zeros(3))
    assert int(act) == 1  # "d" -> index 1
    act = policy._choose_action(np.zeros(3))
    assert int(act) == 0


def test_invalid_key_retries(monkeypatch, capsys):
    policy = make_policy()
    inputs = iter(["zzz", "a"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(inputs))
    act = policy._choose_action(np.zeros(3))
    assert int(act) == 0
    out = capsys.readouterr().out
    assert "Invalid key" in out


def test_predict_batches(monkeypatch):
    policy = make_policy()
    monkeypatch.setattr("builtins.input", lambda prompt="": "d")
    acts = policy.predict(np.zeros((3, 3)))
    np.testing.assert_array_equal(acts, [1, 1, 1])


def test_atari_policy_binds_canonical_keys(monkeypatch):
    from imitation_tpu.policies.interactive import AtariInteractivePolicy

    obs_space = Space.box(0, 255, (84, 84, 3))
    # Pong-style 6-action subset, in action-index order.
    names = ["NOOP", "FIRE", "RIGHT", "LEFT", "RIGHTFIRE", "LEFTFIRE"]
    policy = AtariInteractivePolicy(
        obs_space, Space.discrete(6), names, clear_screen_on_query=False
    )
    assert list(policy.action_keys_names.keys()) == ["1", "2", "d", "a", "h", "f"]
    # 'd' (RIGHT) is action index 2 in this subset
    monkeypatch.setattr("builtins.input", lambda *a: "d")
    monkeypatch.setattr(policy, "_render", lambda obs: None)
    act = policy._choose_action(np.zeros((84, 84, 3)))
    assert int(act) == 2


def test_atari_policy_unknown_action_name_raises():
    from imitation_tpu.policies.interactive import AtariInteractivePolicy

    with pytest.raises(ValueError, match="unknown Atari action"):
        AtariInteractivePolicy(
            Space.box(0, 255, (84, 84, 3)), Space.discrete(1), ["WARP"]
        )


def test_atari_policy_from_env_action_meanings():
    from imitation_tpu.policies.interactive import atari_interactive_policy

    class FakeAle:
        observation_space = Space.box(0, 255, (84, 84, 3))
        action_space = Space.discrete(4)
        unwrapped = None

        def get_action_meanings(self):
            return ["NOOP", "FIRE", "RIGHT", "LEFT"]

    env = FakeAle()
    env.unwrapped = env
    policy = atari_interactive_policy(env, clear_screen_on_query=False)
    assert list(policy.action_keys_names.values()) == [
        "NOOP", "FIRE", "RIGHT", "LEFT",
    ]
