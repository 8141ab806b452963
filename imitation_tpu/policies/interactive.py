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


def cartpole_interactive_policy(space_obs: Space, space_act: Space):
    """Example construction with named bindings."""
    return TextInteractivePolicy(
        space_obs,
        space_act,
        collections.OrderedDict([("a", "push left"), ("d", "push right")]),
    )
