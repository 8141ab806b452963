"""Reward net save/load + the reward-type registry.

Counterpart of reference ``rewards/serialize.py`` (282 LoC): a registry
mapping reward-type strings to loaders that produce a validated ``RewardFn``
from a checkpoint:

* ``RewardNet_unshaped`` — strip shaping wrappers, use the base forward
  (the reference's transfer-eval path, serialize.py:190-214);
* ``RewardNet_shaped`` — full forward including shaping;
* ``RewardNet_normalized`` — predict_processed with frozen stats
  (``update_stats=False`` at relabel time, reference serialize.py:215-243);
* ``RewardNet_unnormalized`` — raw forward ignoring normalizers;
* ``RewardNet_std_added`` — ensemble mean + alpha*std (serialize.py:244-259);
* ``zero`` — all-zero reward (serialize.py:263-282).

Checkpoint format: directory with ``reward_config.json`` (net class + specs)
and ``variables.msgpack``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from imitation_tpu.envs.base import Space
from imitation_tpu.rewards import reward_nets
from imitation_tpu.rewards.reward_function import RewardFn
from imitation_tpu.util import registry

REWARD_CONFIG = "reward_config.json"
REWARD_VARS = "variables.msgpack"

_NET_CLASSES: Dict[str, Callable] = {
    "BasicRewardNet": reward_nets.BasicRewardNet,
    "BasicShapedRewardNet": reward_nets.BasicShapedRewardNet,
    "CnnRewardNet": reward_nets.CnnRewardNet,
    "RewardEnsemble": reward_nets.RewardEnsemble,
}


def _space_io():
    from imitation_tpu.policies.serialize import _space_from_json, _space_to_json

    return _space_to_json, _space_from_json


def _net_config(net: reward_nets.RewardNet, net_kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Class name + kwargs for one (possibly wrapped) net, recursively."""
    cls_name = type(net).__name__
    net_kwargs = dict(net_kwargs or {})
    if isinstance(net, reward_nets.NormalizedRewardNet):
        return {
            "net_class": "NormalizedRewardNet",
            "net_kwargs": {"normalize_cls": net.normalize_cls.__name__},
            "base": _net_config(net.base, net_kwargs),
        }
    if isinstance(net, reward_nets.ShapedRewardNet):
        cls_name = "BasicShapedRewardNet"
    elif isinstance(net, reward_nets.RewardEnsemble):
        cls_name = "RewardEnsemble"
        net_kwargs.setdefault("num_members", net.num_members)
        net_kwargs.setdefault("member_cls", net.member_cls.__name__)
        if net.member_normalize_cls is not None:
            net_kwargs.setdefault(
                "member_normalize_cls", net.member_normalize_cls.__name__
            )
    return {"net_class": cls_name, "net_kwargs": net_kwargs}


def save_reward_net(
    path: str,
    net: reward_nets.RewardNet,
    variables: Any,
    *,
    net_kwargs: Optional[Dict[str, Any]] = None,
) -> None:
    """Saves net class name + spaces + kwargs + variables."""
    to_json, _ = _space_io()
    os.makedirs(path, exist_ok=True)
    config = {
        **_net_config(net, dict(net_kwargs or {})),
        "observation_space": to_json(net.observation_space),
        "action_space": to_json(net.action_space),
    }
    with open(os.path.join(path, REWARD_CONFIG), "w") as f:
        json.dump(config, f, indent=2)
    with open(os.path.join(path, REWARD_VARS), "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(variables)))


def _build_net(config: Dict[str, Any], obs_space, act_space) -> reward_nets.RewardNet:
    from imitation_tpu.models import networks as networks_mod

    cls_name = config["net_class"]
    kwargs = dict(config.get("net_kwargs", {}))
    if cls_name == "NormalizedRewardNet":
        base = _build_net(config["base"], obs_space, act_space)
        normalize_cls = getattr(networks_mod, kwargs.pop("normalize_cls", "RunningNorm"))
        return reward_nets.NormalizedRewardNet(
            observation_space=obs_space,
            action_space=act_space,
            base=base,
            normalize_cls=normalize_cls,
            **kwargs,
        )
    cls = _NET_CLASSES.get(cls_name)
    if cls is None:
        raise ValueError(f"unknown reward net class {cls_name!r}")
    if cls_name == "BasicShapedRewardNet":
        return reward_nets.BasicShapedRewardNet(obs_space, act_space, **kwargs)
    if cls_name == "RewardEnsemble":
        member_cls = _NET_CLASSES[kwargs.pop("member_cls", "BasicRewardNet")]
        norm_name = kwargs.pop("member_normalize_cls", None)
        if norm_name is not None:
            norm_name = getattr(networks_mod, norm_name)
        return reward_nets.RewardEnsemble(
            observation_space=obs_space,
            action_space=act_space,
            member_cls=member_cls,
            member_normalize_cls=norm_name,
            **kwargs,
        )
    return cls(observation_space=obs_space, action_space=act_space, **kwargs)


def load_reward_net(path: str) -> Tuple[reward_nets.RewardNet, Any]:
    _, from_json = _space_io()
    with open(os.path.join(path, REWARD_CONFIG)) as f:
        config = json.load(f)
    net = _build_net(
        config,
        from_json(config["observation_space"]),
        from_json(config["action_space"]),
    )
    template = net.init_variables(jax.random.key(0))
    with open(os.path.join(path, REWARD_VARS), "rb") as f:
        variables = flax.serialization.from_bytes(template, f.read())
    return net, variables


def _validate_wrapper_structure(net, required: type, reward_type: str):
    if not isinstance(net, required):
        raise TypeError(
            f"Reward type {reward_type!r} requires a {required.__name__} "
            f"checkpoint, got {type(net).__name__}",
        )


def _make_fn(apply) -> RewardFn:
    jitted = jax.jit(apply)

    def fn(state, action, next_state, done) -> np.ndarray:
        out = jitted(
            jnp.asarray(state), jnp.asarray(action),
            jnp.asarray(next_state), jnp.asarray(done),
        )
        return np.asarray(out)

    return fn


reward_registry: "registry.Registry[Callable]" = registry.Registry()


def _unwrap_normalized(net):
    """PredictProcessed wrappers sit outermost; strip them for the
    shaped/unshaped forward paths (reference serialize.py:115-170 prefix
    validation + stripping)."""
    depth = 0
    while isinstance(net, reward_nets.NormalizedRewardNet):
        net = net.base
        depth += 1
    return net, depth


def _inner(m, depth):
    for _ in range(depth):
        m = m.base
    return m


def load_reward_apply(
    reward_type: str, path: str, alpha: float = 0.0
) -> Tuple[Callable, Any]:
    """(apply, variables) for a saved reward checkpoint, validated per type.

    ``apply(variables, s, a, ns, d)`` is jittable, so callers can fuse the
    relabel into rollout programs (train_rl transfer eval). Wrapper-structure
    validation matches the reference registry (serialize.py:190-259).
    """
    if reward_type == "zero":
        return (lambda variables, s, a, ns, d: jnp.zeros(s.shape[0], jnp.float32)), {}
    net, variables = load_reward_net(path)
    inner_net, depth = _unwrap_normalized(net)
    if reward_type == "RewardNet_shaped":
        _validate_wrapper_structure(
            inner_net, reward_nets.ShapedRewardNet, reward_type
        )
        apply = lambda v, s, a, ns, d: net.apply(
            v, s, a, ns, d, method=lambda m, *args: _inner(m, depth)(*args)
        )
    elif reward_type == "RewardNet_unshaped":
        _validate_wrapper_structure(
            inner_net, reward_nets.ShapedRewardNet, reward_type
        )
        apply = lambda v, s, a, ns, d: net.apply(
            v, s, a, ns, d,
            method=lambda m, *args: _inner(m, depth).base_forward(*args),
        )
    elif reward_type == "RewardNet_normalized":
        _validate_wrapper_structure(
            net, reward_nets.NormalizedRewardNet, reward_type
        )
        # frozen stats at relabel time (reference serialize.py:215-243)
        apply = lambda v, s, a, ns, d: net.apply(
            v, s, a, ns, d, False, method="predict_processed"
        )
    elif reward_type == "RewardNet_unnormalized":
        apply = lambda v, s, a, ns, d: net.apply(
            v, s, a, ns, d, method=lambda m, *args: _inner(m, depth)(*args)
        )
    elif reward_type == "RewardNet_std_added":
        _validate_wrapper_structure(net, reward_nets.RewardEnsemble, reward_type)

        def apply(v, s, a, ns, d):
            mean, var = net.apply(v, s, a, ns, d, method="predict_reward_moments")
            return mean + alpha * jnp.sqrt(var)

    else:
        raise ValueError(f"unknown reward type {reward_type!r}")
    return apply, variables


def _load_shaped(path: str, venv=None, **kwargs) -> RewardFn:
    apply, variables = load_reward_apply("RewardNet_shaped", path)
    return _make_fn(lambda s, a, ns, d: apply(variables, s, a, ns, d))


def _load_unshaped(path: str, venv=None, **kwargs) -> RewardFn:
    apply, variables = load_reward_apply("RewardNet_unshaped", path)
    return _make_fn(lambda s, a, ns, d: apply(variables, s, a, ns, d))


def _load_normalized(path: str, venv=None, update_stats: bool = False, **kwargs) -> RewardFn:
    """Normalized inference path with frozen stats (reference serialize.py:215-243:
    ``update_stats=False`` at relabel time; requires a NormalizedRewardNet
    checkpoint, reference test ``test_cant_load_unnorm_as_norm``)."""
    apply, variables = load_reward_apply("RewardNet_normalized", path)
    return _make_fn(lambda s, a, ns, d: apply(variables, s, a, ns, d))


def _load_unnormalized(path: str, venv=None, **kwargs) -> RewardFn:
    apply, variables = load_reward_apply("RewardNet_unnormalized", path)
    return _make_fn(lambda s, a, ns, d: apply(variables, s, a, ns, d))


def _load_zero(path: str = "", venv=None, **kwargs) -> RewardFn:
    def fn(state, action, next_state, done):
        return np.zeros(len(state), np.float32)

    return fn


def _load_std_added(path: str, venv=None, alpha: float = 0.0, **kwargs) -> RewardFn:
    """Ensemble mean + alpha*std (reference serialize.py:244-259)."""
    apply, variables = load_reward_apply("RewardNet_std_added", path, alpha=alpha)
    return _make_fn(lambda s, a, ns, d: apply(variables, s, a, ns, d))


reward_registry.register("RewardNet_std_added", value=_load_std_added)
reward_registry.register("RewardNet_shaped", value=_load_shaped)
reward_registry.register("RewardNet_unshaped", value=_load_unshaped)
reward_registry.register("RewardNet_normalized", value=_load_normalized)
reward_registry.register("RewardNet_unnormalized", value=_load_unnormalized)
reward_registry.register("zero", value=_load_zero)


def load_reward(reward_type: str, reward_path: str, venv=None, **kwargs) -> RewardFn:
    """Load a RewardFn by registry type (reference serialize.py:263-282)."""
    loader = reward_registry.get(reward_type)
    return loader(reward_path, venv=venv, **kwargs)
