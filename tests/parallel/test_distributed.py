"""Simulated multi-host test: 2 processes x 4 virtual CPU devices.

The reference has no multi-node tests to mirror (SURVEY §4 "Multi-node
story: there is none") — this is our addition: spawn two real OS processes
coordinated via jax.distributed (gloo CPU collectives), build the hybrid
('dp','tp') mesh across them, and check a psum'd SGD step produces identical
replicated params on both processes, equal to the single-process answer.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(module: str, tmp_path, n_procs: int = 2, extra_env=None) -> None:
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device-count flag
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(n_procs),
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.update(extra_env or {})
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", module, str(tmp_path)],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out


@pytest.mark.slow
def test_two_process_psum_step(tmp_path):
    _run_workers("tests.parallel._distributed_worker", tmp_path)

    r0 = np.load(tmp_path / "result_0.npz")
    r1 = np.load(tmp_path / "result_1.npz")

    # Both processes computed identical replicated results.
    np.testing.assert_allclose(r0["w"], r1["w"], rtol=1e-6)
    assert r0["batch_mean"] == r1["batch_mean"]

    # Single-process ground truth of the same global computation.
    x = np.concatenate(
        [np.arange(16, dtype=np.float32).reshape(4, 4) + 100.0 * pid
         for pid in range(2)]
    )
    w = np.ones(4, np.float32)
    y = x @ w
    grad = 2.0 * (x.T @ y) / x.shape[0]
    expected_w = w - 0.01 * grad
    np.testing.assert_allclose(r0["w"], expected_w, rtol=1e-4)
    np.testing.assert_allclose(r0["batch_mean"], x.mean(), rtol=1e-6)

    # process_allgather handed every host the full global batch.
    np.testing.assert_allclose(r0["full"], x, rtol=1e-6)
    np.testing.assert_allclose(r1["full"], x, rtol=1e-6)


@pytest.mark.slow
def test_two_process_ppo_train_step(tmp_path):
    """The framework's real jitted PPO train step runs SPMD across two
    processes and leaves both with identical replicated parameters."""
    _run_workers("tests.parallel._ppo_worker", tmp_path)
    r0 = np.load(tmp_path / "ppo_0.npz")
    r1 = np.load(tmp_path / "ppo_1.npz")
    np.testing.assert_array_equal(r0["flat"], r1["flat"])
    assert np.isfinite(r0["loss"]) and r0["loss"] == r1["loss"]
    assert np.all(np.isfinite(r0["flat"]))


@pytest.mark.slow
def test_four_process_ppo_2x2_mesh(tmp_path):
    """4 processes x 2 virtual devices each = a dp=4 x tp=2 GLOBAL mesh with
    a non-trivial process-to-mesh mapping (each process is one dp row; the
    tp pair lives inside a process, so tp collectives stay 'ICI' while dp
    psums cross the 'DCN' boundary). Params are genuinely tp-sharded
    (shard_params_tp_global); all four processes must end bit-identical
    (VERDICT r3 item 6)."""
    _run_workers(
        "tests.parallel._ppo_worker", tmp_path, n_procs=4,
        extra_env={"WORKER_LOCAL_DEVICES": "2", "WORKER_TP": "2"},
    )
    results = [np.load(tmp_path / f"ppo_{pid}.npz") for pid in range(4)]
    for r in results[1:]:
        np.testing.assert_array_equal(results[0]["flat"], r["flat"])
        assert results[0]["loss"] == r["loss"]
    assert np.isfinite(results[0]["loss"])
    assert np.all(np.isfinite(results[0]["flat"]))


@pytest.mark.slow
def test_four_process_fused_adversarial_2x2(tmp_path):
    """GAIL train_fused SPMD over 4 processes with the dp=4 x tp=2 global
    mesh: same bit-identity + fused assertions as the 2-process test."""
    _run_workers(
        "tests.parallel._fused_worker", tmp_path, n_procs=4,
        extra_env={"WORKER_LOCAL_DEVICES": "2", "WORKER_TP": "2"},
    )
    results = [np.load(tmp_path / f"fused_{pid}.npz") for pid in range(4)]
    for r in results[1:]:
        np.testing.assert_array_equal(results[0]["gen"], r["gen"])
        np.testing.assert_array_equal(results[0]["disc"], r["disc"])
    assert int(results[0]["n_updates"]) == 4
    assert int(results[0]["disc_step"]) == 8
    assert np.all(np.isfinite(results[0]["gen"]))
    assert np.all(np.isfinite(results[0]["disc"]))


@pytest.mark.slow
def test_two_process_fused_adversarial(tmp_path):
    """GAIL's train_fused — the scanned multi-round program — runs SPMD
    across two processes over the global hybrid mesh; both end with
    bit-identical generator AND discriminator parameters (the multi-host
    flagship path, VERDICT r2 #3)."""
    _run_workers("tests.parallel._fused_worker", tmp_path)
    r0 = np.load(tmp_path / "fused_0.npz")
    r1 = np.load(tmp_path / "fused_1.npz")
    np.testing.assert_array_equal(r0["gen"], r1["gen"])
    np.testing.assert_array_equal(r0["disc"], r1["disc"])
    assert int(r0["n_updates"]) == 4
    assert int(r0["disc_step"]) == 8
    assert np.all(np.isfinite(r0["gen"])) and np.all(np.isfinite(r0["disc"]))
