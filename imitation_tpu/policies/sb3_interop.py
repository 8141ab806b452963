"""Load Stable Baselines 3 ``model.zip`` policies into this framework.

The reference's experts and HuggingFace-hub artifacts are SB3 PPO models
(reference: policies/serialize.py:123-152 loads them via
``PPO.load(model.zip)``). This module reads the ``policy.pth`` state dict
out of an SB3 zip with plain ``torch`` + ``zipfile`` (no SB3 dependency) and
converts it into an :class:`ActorCriticPolicy` variables pytree, so
reference-trained experts run natively on TPU.

Supported: ActorCriticPolicy-family models (PPO/A2C) with separate pi/vf
MLP torsos (SB3 default ``net_arch``), flatten feature extractor, tanh or
relu activations, discrete or diag-Gaussian heads. Anything else (shared
torsos, CNN extractors, SAC actors) raises with a clear message.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from imitation_tpu.envs.base import Space
from imitation_tpu.models.policies import ActorCriticPolicy


def _read_sb3_zip(path: str) -> Tuple[dict, dict]:
    """Returns (state_dict as numpy, data-json dict) from an SB3 model.zip."""
    import torch

    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        if "policy.pth" not in names:
            raise ValueError(
                f"{path!r} does not look like an SB3 model.zip "
                f"(no policy.pth; members: {names})"
            )
        with zf.open("policy.pth") as f:
            sd = torch.load(
                io.BytesIO(f.read()), map_location="cpu", weights_only=True
            )
        data = {}
        if "data" in names:
            try:
                data = json.loads(zf.read("data").decode("utf-8"))
            except (UnicodeDecodeError, json.JSONDecodeError):
                data = {}
    return {k: np.asarray(v.numpy()) for k, v in sd.items()}, data


def _dense(sd: dict, torch_prefix: str) -> dict:
    return {
        "kernel": jnp.asarray(sd[f"{torch_prefix}.weight"].T),
        "bias": jnp.asarray(sd[f"{torch_prefix}.bias"]),
    }


def load_sb3_policy(
    path: str,
    observation_space: Space,
    action_space: Space,
) -> Tuple[ActorCriticPolicy, Any]:
    """Converts an SB3 ActorCriticPolicy ``model.zip`` to (policy, variables).

    Weight layout (SB3 torch -> flax): ``mlp_extractor.policy_net.{2i}`` ->
    ``pi{i}``, ``mlp_extractor.value_net.{2i}`` -> ``vf{i}``,
    ``action_net`` -> ``pi_out``, ``value_net`` -> ``vf_out``, ``log_std``
    -> ``log_std`` (torch Linear weights are [out, in]; flax kernels are
    their transpose).
    """
    sd, data = _read_sb3_zip(path)

    shared = [k for k in sd if k.startswith("mlp_extractor.shared_net")]
    if shared:
        raise NotImplementedError(
            "SB3 policies with shared pi/vf torso layers are not supported "
            f"(found {shared[:2]}...); retrain with separate net_arch"
        )
    cnn = [k for k in sd if "features_extractor" in k and "weight" in k]
    if cnn:
        raise NotImplementedError(
            "SB3 CNN/custom feature extractors are not supported "
            f"(found {cnn[:2]}...)"
        )

    # Infer hidden sizes from the policy torso.
    hid_sizes = []
    i = 0
    while f"mlp_extractor.policy_net.{2 * i}.weight" in sd:
        hid_sizes.append(sd[f"mlp_extractor.policy_net.{2 * i}.weight"].shape[0])
        i += 1
    if not hid_sizes:
        raise ValueError(
            f"no mlp_extractor.policy_net layers found in {sorted(sd)}"
        )

    act_fn = str(data.get("activation_fn", "Tanh"))
    if "ReLU" in act_fn:
        import flax.linen as nn

        activation = nn.relu
    else:
        import flax.linen as nn

        activation = nn.tanh  # SB3 default

    in_dim = sd["mlp_extractor.policy_net.0.weight"].shape[1]
    flat_obs = int(np.prod(observation_space.shape))
    if in_dim != flat_obs:
        raise ValueError(
            f"SB3 policy expects {in_dim}-dim flat obs; env has {flat_obs}"
        )
    out_dim = sd["action_net.weight"].shape[0]
    expected_out = (
        action_space.n if action_space.is_discrete else action_space.flat_dim
    )
    if out_dim != expected_out:
        raise ValueError(
            f"SB3 action head is {out_dim}-dim; env action space needs "
            f"{expected_out}"
        )

    policy = ActorCriticPolicy(
        observation_space=observation_space,
        action_space=action_space,
        hid_sizes=tuple(hid_sizes),
        activation=activation,
    )
    params = {}
    for j in range(len(hid_sizes)):
        params[f"pi{j}"] = _dense(sd, f"mlp_extractor.policy_net.{2 * j}")
        params[f"vf{j}"] = _dense(sd, f"mlp_extractor.value_net.{2 * j}")
    params["pi_out"] = _dense(sd, "action_net")
    params["vf_out"] = _dense(sd, "value_net")
    if not action_space.is_discrete:
        if "log_std" not in sd:
            raise ValueError("continuous SB3 policy without log_std")
        params["log_std"] = jnp.asarray(sd["log_std"])
    return policy, {"params": params}


def load_sb3_policy_for_env(path: str, venv) -> Tuple[ActorCriticPolicy, Any]:
    return load_sb3_policy(path, venv.observation_space, venv.action_space)
