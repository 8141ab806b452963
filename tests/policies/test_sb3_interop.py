"""SB3 model.zip -> ActorCriticPolicy weight conversion.

Mirrors the reference's ability to load SB3-trained experts
(reference policies/serialize.py:123-152): we build an SB3-format zip with
plain torch (no SB3 dependency), convert it, and check the jax policy's
logits/values equal a manual torch forward of the same weights.
"""

import io
import json
import os
import zipfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from imitation_tpu.envs.base import Space  # noqa: E402
from imitation_tpu.policies import sb3_interop  # noqa: E402
from imitation_tpu.policies.serialize import load_policy  # noqa: E402


def _make_sb3_zip(path, obs_dim, out_dim, hid=(64, 64), continuous=False,
                  activation="Tanh"):
    g = torch.Generator().manual_seed(0)
    sd = {}
    dims_in = [obs_dim, *hid[:-1]]
    for i, (din, dout) in enumerate(zip(dims_in, hid)):
        for net in ("policy_net", "value_net"):
            sd[f"mlp_extractor.{net}.{2 * i}.weight"] = torch.randn(
                dout, din, generator=g
            )
            sd[f"mlp_extractor.{net}.{2 * i}.bias"] = torch.randn(
                dout, generator=g
            )
    sd["action_net.weight"] = torch.randn(out_dim, hid[-1], generator=g)
    sd["action_net.bias"] = torch.randn(out_dim, generator=g)
    sd["value_net.weight"] = torch.randn(1, hid[-1], generator=g)
    sd["value_net.bias"] = torch.randn(1, generator=g)
    if continuous:
        sd["log_std"] = torch.randn(out_dim, generator=g) * 0.1
    buf = io.BytesIO()
    torch.save(sd, buf)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("policy.pth", buf.getvalue())
        zf.writestr("data", json.dumps({"activation_fn": activation}))
    return sd


def _torch_forward(sd, obs, hid, act=torch.tanh):
    pi = vf = torch.as_tensor(obs, dtype=torch.float32)
    for i in range(len(hid)):
        pi = act(pi @ sd[f"mlp_extractor.policy_net.{2*i}.weight"].T
                 + sd[f"mlp_extractor.policy_net.{2*i}.bias"])
        vf = act(vf @ sd[f"mlp_extractor.value_net.{2*i}.weight"].T
                 + sd[f"mlp_extractor.value_net.{2*i}.bias"])
    logits = pi @ sd["action_net.weight"].T + sd["action_net.bias"]
    value = (vf @ sd["value_net.weight"].T + sd["value_net.bias"]).squeeze(-1)
    return logits.numpy(), value.numpy()


def test_discrete_conversion_matches_torch(tmp_path):
    path = str(tmp_path / "model.zip")
    sd = _make_sb3_zip(path, obs_dim=4, out_dim=2)
    obs_space = Space(shape=(4,), dtype=np.float32)
    act_space = Space(shape=(), dtype=np.int64, n=2)
    policy, variables = sb3_interop.load_sb3_policy(path, obs_space, act_space)
    assert tuple(policy.hid_sizes) == (64, 64)
    obs = np.random.default_rng(1).normal(size=(7, 4)).astype(np.float32)
    dist, value = policy.dist_and_value(variables, obs)
    exp_logits, exp_value = _torch_forward(sd, obs, (64, 64))
    np.testing.assert_allclose(np.asarray(dist.logits), exp_logits, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), exp_value, atol=1e-5)


def test_continuous_conversion_log_std(tmp_path):
    path = str(tmp_path / "model.zip")
    sd = _make_sb3_zip(path, obs_dim=3, out_dim=2, hid=(32,), continuous=True)
    obs_space = Space(shape=(3,), dtype=np.float32)
    act_space = Space(shape=(2,), dtype=np.float32, low=-1.0, high=1.0)
    policy, variables = sb3_interop.load_sb3_policy(path, obs_space, act_space)
    obs = np.random.default_rng(2).normal(size=(5, 3)).astype(np.float32)
    dist, _ = policy.dist_and_value(variables, obs)
    exp_mean, _ = _torch_forward(sd, obs, (32,))
    np.testing.assert_allclose(np.asarray(dist.mean), exp_mean, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dist.log_std), sd["log_std"].numpy(), atol=1e-6
    )


def test_shape_mismatch_raises(tmp_path):
    path = str(tmp_path / "model.zip")
    _make_sb3_zip(path, obs_dim=4, out_dim=2)
    obs_space = Space(shape=(5,), dtype=np.float32)
    act_space = Space(shape=(), dtype=np.int64, n=2)
    with pytest.raises(ValueError, match="flat obs"):
        sb3_interop.load_sb3_policy(path, obs_space, act_space)


def test_registry_routes_zip_to_sb3(tmp_path):
    from imitation_tpu.envs import make_vec_env

    venv = make_vec_env("CartPole-v1", num_envs=2)
    path = str(tmp_path / "model.zip")
    _make_sb3_zip(path, obs_dim=4, out_dim=2)
    policy, variables = load_policy("ppo", venv, path=path)
    assert "pi_out" in variables["params"]
    # dir containing model.zip also works (SB3 save layout)
    policy2, _ = load_policy("ppo", venv, path=str(tmp_path))
    assert tuple(policy2.hid_sizes) == (64, 64)


REFERENCE_ZIP = (
    "/root/reference/tests/testdata/expert_models/cartpole_0/policies/final/"
    "model.zip"
)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_ZIP), reason="reference artifact not present"
)
def test_loads_real_reference_expert_and_acts_well():
    """The reference repo's committed CartPole expert should transfer: its
    converted policy must clearly beat random on CartPole."""
    import jax

    from imitation_tpu.data import rollout as rollout_mod
    from imitation_tpu.envs import make_vec_env

    venv = make_vec_env("CartPole-v1", num_envs=8)
    policy, variables = sb3_interop.load_sb3_policy_for_env(
        REFERENCE_ZIP, venv
    )
    trajs = rollout_mod.generate_trajectories(
        policy.deterministic_fn(), variables, venv,
        rollout_mod.make_min_episodes(10), rng=0,
    )
    mean_ret = float(np.mean([t.rews.sum() for t in trajs]))
    assert mean_ret > 400, f"converted SB3 expert scored {mean_ret}"


def test_huggingface_loader_offline_error(monkeypatch):
    from imitation_tpu.envs import make_vec_env

    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    venv = make_vec_env("CartPole-v1", num_envs=1)
    with pytest.raises(RuntimeError, match="HuggingFace hub"):
        load_policy("ppo-huggingface", venv, env_name="seals/CartPole-v0")
