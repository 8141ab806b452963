"""Policy save/load + the policy-type registry.

Counterpart of reference ``policies/serialize.py`` (231 LoC): a string-keyed
registry of policy loaders (``random``, ``zero``, ``ppo``, ``sac``, ...),
``save_stable_model``-style checkpointing, and periodic save callbacks.

Format: a directory containing ``policy_config.json`` (architecture + spaces)
and ``variables.msgpack`` (flax serialized pytree) — a self-describing,
framework-version-tolerant layout replacing torch ``model.zip`` pickles.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import flax.serialization
import jax
import numpy as np

from imitation_tpu.envs.base import Space
from imitation_tpu.envs.vector import VectorEnv
from imitation_tpu.models.policies import (
    ActorCriticPolicy,
    RandomPolicy,
    ZeroPolicy,
)
from imitation_tpu.util import registry

POLICY_CONFIG = "policy_config.json"
POLICY_VARS = "variables.msgpack"


def _space_to_json(space: Space) -> Dict[str, Any]:
    return {
        "shape": list(space.shape),
        "dtype": np.dtype(space.dtype).name,
        "n": space.n,
        "low": None if space.low is None else np.asarray(space.low).tolist(),
        "high": None if space.high is None else np.asarray(space.high).tolist(),
    }


def _space_from_json(d: Dict[str, Any]) -> Space:
    return Space(
        shape=tuple(d["shape"]),
        dtype=np.dtype(d["dtype"]).type,
        n=d["n"],
        low=None if d["low"] is None else np.asarray(d["low"], d["dtype"]),
        high=None if d["high"] is None else np.asarray(d["high"], d["dtype"]),
    )


def save_policy(path: str, policy: Any, variables: Any) -> None:
    """Saves policy architecture + variables to ``path`` (a directory).

    Handles ActorCriticPolicy and SACPolicy (reference saves PPO/SAC
    model.zip via save_stable_model, policies/serialize.py:155-180).
    """
    from imitation_tpu.rl.sac import SACPolicy

    os.makedirs(path, exist_ok=True)
    if isinstance(policy, SACPolicy):
        config = {
            "policy_type": "sac_actor",
            "observation_space": _space_to_json(policy.observation_space),
            "action_space": _space_to_json(policy.action_space),
            "hid_sizes": list(policy.hid_sizes),
        }
    else:
        act_name = getattr(policy.activation, "__name__", None) or getattr(
            getattr(policy.activation, "__wrapped__", None), "__name__", "tanh"
        )
        config = {
            "policy_type": "actor_critic",
            "observation_space": _space_to_json(policy.observation_space),
            "action_space": _space_to_json(policy.action_space),
            "hid_sizes": list(policy.hid_sizes),
            "normalize_features": policy.normalize_features,
            "log_std_init": policy.log_std_init,
            "activation": act_name,
            "features": getattr(policy, "features", "flatten"),
        }
    with open(os.path.join(path, POLICY_CONFIG), "w") as f:
        json.dump(config, f, indent=2)
    with open(os.path.join(path, POLICY_VARS), "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(variables)))


def load_policy_from_path(path: str) -> Tuple[ActorCriticPolicy, Any]:
    """Loads (policy, variables) saved by ``save_policy``."""
    with open(os.path.join(path, POLICY_CONFIG)) as f:
        config = json.load(f)
    if config["policy_type"] == "sac_actor":
        from imitation_tpu.rl.sac import SACPolicy

        policy = SACPolicy(
            observation_space=_space_from_json(config["observation_space"]),
            action_space=_space_from_json(config["action_space"]),
            hid_sizes=tuple(config["hid_sizes"]),
        )
        template = policy.init_variables(jax.random.key(0))
        with open(os.path.join(path, POLICY_VARS), "rb") as f:
            variables = flax.serialization.from_bytes(template, f.read())
        return policy, variables
    if config["policy_type"] != "actor_critic":
        raise ValueError(f"unknown policy_type {config['policy_type']!r}")
    import flax.linen as nn

    activations = {"tanh": nn.tanh, "relu": nn.relu, "sigmoid": nn.sigmoid,
                   "gelu": nn.gelu, "elu": nn.elu}
    policy = ActorCriticPolicy(
        observation_space=_space_from_json(config["observation_space"]),
        action_space=_space_from_json(config["action_space"]),
        hid_sizes=tuple(config["hid_sizes"]),
        normalize_features=config["normalize_features"],
        log_std_init=config["log_std_init"],
        activation=activations[config.get("activation", "tanh")],
        features=config.get("features", "flatten"),
    )
    template = policy.init(jax.random.key(0))
    with open(os.path.join(path, POLICY_VARS), "rb") as f:
        variables = flax.serialization.from_bytes(template, f.read())
    return policy, variables


# ---------------------------------------------------------------------------
# Registry (reference policies/serialize.py:27-152)
# ---------------------------------------------------------------------------

# A loader returns (policy, variables) given (venv, **kwargs).
PolicyLoaderFn = Callable[..., Tuple[Any, Any]]

policy_registry: "registry.Registry[PolicyLoaderFn]" = registry.Registry()


def _load_random(venv: VectorEnv, **kwargs):
    pol = RandomPolicy(venv.observation_space, venv.action_space)
    return pol, {}


def _load_zero(venv: VectorEnv, **kwargs):
    pol = ZeroPolicy(venv.observation_space, venv.action_space)
    return pol, {}


def _load_saved(venv: VectorEnv, path: str, **kwargs):
    # SB3 interop: a model.zip (or a dir containing one) is a reference /
    # SB3-trained policy — convert its weights (reference loads these via
    # PPO.load, policies/serialize.py:123-152).
    zip_path = None
    if path.endswith(".zip") and os.path.exists(path):
        zip_path = path
    elif os.path.isdir(path) and os.path.exists(os.path.join(path, "model.zip")):
        zip_path = os.path.join(path, "model.zip")
    if zip_path is not None:
        from imitation_tpu.policies import sb3_interop

        return sb3_interop.load_sb3_policy_for_env(zip_path, venv)
    policy, variables = load_policy_from_path(path)
    if policy.observation_space.shape != venv.observation_space.shape:
        raise ValueError(
            "policy observation space does not match env: "
            f"{policy.observation_space.shape} vs {venv.observation_space.shape}"
        )
    return policy, variables


def _hf_model_name(algo: str, env_name: str) -> str:
    """huggingface_sb3 naming: '/' in env ids becomes '-'."""
    return f"{algo}-{env_name.replace('/', '-')}"


def _load_huggingface(
    venv: VectorEnv,
    env_name: str,
    algo: str = "ppo",
    organization: str = "HumanCompatibleAI",
    **kwargs,
):
    """Download an SB3 expert from the HuggingFace hub and convert it
    (reference policies/serialize.py:155-202, huggingface_sb3 naming).

    Needs network access; with a warm local hub cache it also works
    offline (huggingface_hub falls back to the cache on connection errors).
    """
    model_name = _hf_model_name(algo, env_name)
    repo_id = f"{organization}/{model_name}"
    try:
        from huggingface_hub import hf_hub_download

        path = hf_hub_download(repo_id=repo_id, filename=f"{model_name}.zip")
    except Exception as e:
        raise RuntimeError(
            f"could not fetch {repo_id} from the HuggingFace hub (offline?). "
            "Download the model zip manually and load it with "
            "policy_type='ppo' path=<model.zip>."
        ) from e
    from imitation_tpu.policies import sb3_interop

    return sb3_interop.load_sb3_policy_for_env(path, venv)


policy_registry.register("random", value=_load_random)
policy_registry.register("zero", value=_load_zero)
policy_registry.register("ppo", value=_load_saved)
policy_registry.register("sac", value=_load_saved)
policy_registry.register("saved", value=_load_saved)
policy_registry.register(
    "ppo-huggingface", value=functools.partial(_load_huggingface, algo="ppo")
)
policy_registry.register(
    "sac-huggingface", value=functools.partial(_load_huggingface, algo="sac")
)


def load_policy(policy_type: str, venv: VectorEnv, **kwargs):
    """Load (policy, variables) by registry type (reference :123-152)."""
    loader = policy_registry.get(policy_type)
    return loader(venv, **kwargs)


class SavePolicyCallback:
    """Periodic policy checkpointing callback (reference :204-231)."""

    def __init__(self, policy_dir: str, policy: ActorCriticPolicy, save_interval_updates: int = 1):
        self.policy_dir = policy_dir
        self.policy = policy
        self.save_interval = save_interval_updates
        self._count = 0

    def __call__(self, state, metrics=None) -> None:
        self._count += 1
        if self._count % self.save_interval == 0:
            path = os.path.join(self.policy_dir, f"{self._count:012d}")
            save_policy(path, self.policy, state.variables)
