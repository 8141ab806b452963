"""Test configuration: force an 8-device virtual CPU mesh.

Tests must not touch the real TPU (single chip, tunneled — per-test dispatch
would be slow and serialized). Instead we run on the host CPU with 8 virtual
XLA devices so mesh-sharded code paths (dp/fsdp axes) are exercised the way
the driver's ``dryrun_multichip`` does.

This mirrors the reference's ``torch_single_threaded`` session fixture
(reference: tests/conftest.py:26-38) in spirit: deterministic, parallel-safe
test execution.
"""

import os

# Must run before any XLA backend is created.
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


@pytest.fixture
def key() -> jax.Array:
    return jax.random.key(42)


@pytest.fixture(params=[1, 4])
def cartpole_venv(request):
    """CartPole VectorEnv over 1 and 4 envs (reference tests/conftest.py:15-23)."""
    from imitation_tpu.envs import make_vec_env

    return make_vec_env("CartPole-v1", num_envs=request.param)


@pytest.fixture
def pendulum_venv():
    from imitation_tpu.envs import make_vec_env

    return make_vec_env("Pendulum-v1", num_envs=8)
