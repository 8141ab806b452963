"""Interactive (human-in-the-loop) policies.

Counterpart of reference ``policies/interactive.py`` (159 LoC): a console /
matplotlib policy that displays the current observation and queries the user
for a discrete action each step, with named key bindings (the reference
ships Atari bindings via shimmy; here bindings are supplied per env).
"""

from __future__ import annotations

import abc
import collections
from typing import Dict, Optional, Union

import numpy as np

from imitation_tpu.envs.base import Space
from imitation_tpu.policies.base import NonTrainablePolicy


class DiscreteInteractivePolicy(NonTrainablePolicy, abc.ABC):
    """Queries a human for discrete actions (reference interactive.py:17-95).

    ``action_keys_names`` maps key -> human-readable action name, in action
    index order.
    """

    def __init__(
        self,
        observation_space: Space,
        action_space: Space,
        action_keys_names: "collections.OrderedDict[str, str]",
        clear_screen_on_query: bool = True,
    ):
        super().__init__(observation_space, action_space)
        if not action_space.is_discrete:
            raise ValueError("DiscreteInteractivePolicy requires a discrete space")
        if len(action_keys_names) != action_space.n:
            raise ValueError(
                f"need one key per action: {len(action_keys_names)} != {action_space.n}"
            )
        if len(set(action_keys_names.keys())) != len(action_keys_names):
            raise ValueError("duplicate action keys")
        self.action_keys_names = action_keys_names
        self.action_key_to_index = {
            k: i for i, k in enumerate(action_keys_names.keys())
        }
        self.clear_screen_on_query = clear_screen_on_query

    def _choose_action(self, obs: np.ndarray) -> np.ndarray:
        if self.clear_screen_on_query:
            print("\033c", end="")
        self._render(obs)
        context = ", ".join(
            f"{key}: {name}" for key, name in self.action_keys_names.items()
        )
        while True:
            print(f"Please select an action. Possible choices in [{context}]")
            key = input("Your choice (enter key): ").strip()
            if key in self.action_key_to_index:
                return np.asarray(self.action_key_to_index[key])
            print(f"Invalid key: {key!r}")

    @abc.abstractmethod
    def _render(self, obs: np.ndarray) -> None:
        ...


class TextInteractivePolicy(DiscreteInteractivePolicy):
    """Prints the observation as text (console envs)."""

    def _render(self, obs: np.ndarray) -> None:
        print(f"Observation: {np.asarray(obs)}")


class ImageObsDiscreteInteractivePolicy(DiscreteInteractivePolicy):
    """Shows image observations via matplotlib (reference interactive.py:97-137)."""

    def _render(self, obs: np.ndarray) -> None:
        import matplotlib.pyplot as plt

        img = self._prepare_obs_image(obs)
        plt.figure("interactive")
        plt.clf()
        plt.imshow(img, cmap="gray" if img.ndim == 2 else None)
        plt.axis("off")
        plt.pause(0.01)

    def _prepare_obs_image(self, obs: np.ndarray) -> np.ndarray:
        """Hook for cropping/processing (reference AtariInteractivePolicy)."""
        return np.asarray(obs)


# Canonical key bindings for the full Atari action set (reference
# interactive.py:118-137 ATARI_ACTION_NAMES_TO_KEYS): directions on a
# wasd-style rose, FIRE variants on the surrounding keys.
ATARI_ACTION_NAMES_TO_KEYS: Dict[str, str] = {
    "NOOP": "1",
    "FIRE": "2",
    "UP": "w",
    "RIGHT": "d",
    "LEFT": "a",
    "DOWN": "x",
    "UPRIGHT": "e",
    "UPLEFT": "q",
    "DOWNRIGHT": "c",
    "DOWNLEFT": "z",
    "UPFIRE": "t",
    "RIGHTFIRE": "h",
    "LEFTFIRE": "f",
    "DOWNFIRE": "b",
    "UPRIGHTFIRE": "y",
    "UPLEFTFIRE": "r",
    "DOWNRIGHTFIRE": "n",
    "DOWNLEFTFIRE": "v",
}


class AtariInteractivePolicy(ImageObsDiscreteInteractivePolicy):
    """Interactive policy for Atari-style image envs (reference
    interactive.py:140-159).

    ``action_names`` is the env's action-meaning list in action-index
    order — pass ``env.get_action_meanings()`` (ALE API), or for an env
    behind our gym bridge, ``venv.env.unwrapped.get_action_meanings()``.
    Each name is bound to its canonical key from
    ``ATARI_ACTION_NAMES_TO_KEYS``, so e.g. Pong's 6-action subset gets
    the same keys as Breakout's 4-action subset.
    """

    def __init__(
        self,
        observation_space: Space,
        action_space: Space,
        action_names: "collections.abc.Sequence[str]",
        **kwargs,
    ):
        unknown = [n for n in action_names if n not in ATARI_ACTION_NAMES_TO_KEYS]
        if unknown:
            raise ValueError(
                f"unknown Atari action name(s) {unknown}; expected a subset "
                f"of {sorted(ATARI_ACTION_NAMES_TO_KEYS)}"
            )
        action_keys_names = collections.OrderedDict(
            (ATARI_ACTION_NAMES_TO_KEYS[name], name) for name in action_names
        )
        super().__init__(observation_space, action_space, action_keys_names, **kwargs)


def atari_interactive_policy(venv, **kwargs) -> AtariInteractivePolicy:
    """Builds an AtariInteractivePolicy from a (bridged) Atari env by
    querying its action meanings (reference interactive.py:143-151)."""
    base = getattr(venv, "env", venv)
    base = getattr(base, "unwrapped", base)
    if not hasattr(base, "get_action_meanings"):
        raise ValueError(
            "env does not expose get_action_meanings(); pass action_names to "
            "AtariInteractivePolicy directly"
        )
    return AtariInteractivePolicy(
        venv.observation_space, venv.action_space, base.get_action_meanings(), **kwargs
    )


def cartpole_interactive_policy(space_obs: Space, space_act: Space):
    """Example construction with named bindings."""
    return TextInteractivePolicy(
        space_obs,
        space_act,
        collections.OrderedDict([("a", "push left"), ("d", "push right")]),
    )
