"""Bench pause-protocol watchdog (benchmarking/bench_watchdog.py)."""

import os
import signal
import subprocess
import time

import pytest

from benchmarking import bench_watchdog


@pytest.fixture
def scratch_protocol(tmp_path, monkeypatch):
    sentinel = tmp_path / "BENCH_RUNNING"
    pid_dir = tmp_path / "queue_pids"
    pid_dir.mkdir()
    monkeypatch.setattr(bench_watchdog, "SENTINEL", str(sentinel))
    monkeypatch.setattr(bench_watchdog, "PID_DIR", str(pid_dir))
    return sentinel, pid_dir


def test_no_sentinel_is_noop(scratch_protocol):
    assert bench_watchdog.repair_if_stale() is False


def test_live_bench_left_alone(scratch_protocol):
    sentinel, _ = scratch_protocol
    sentinel.write_text(str(os.getpid()))  # this test process is "the bench"
    assert bench_watchdog.repair_if_stale() is False
    assert sentinel.exists()


def test_stale_sentinel_repaired_and_lane_resumed(scratch_protocol):
    sentinel, pid_dir = scratch_protocol
    sentinel.write_text("999999")  # dead pid
    proc = subprocess.Popen(["sleep", "30"], start_new_session=True)
    try:
        os.kill(proc.pid, signal.SIGSTOP)
        (pid_dir / "lane.pgid").write_text(str(proc.pid))
        assert bench_watchdog.repair_if_stale() is True
        assert not sentinel.exists()
        deadline = time.time() + 5
        state = "?"
        while time.time() < deadline:
            with open(f"/proc/{proc.pid}/stat") as f:
                state = f.read().split()[2]
            if state != "T":
                break
            time.sleep(0.1)
        assert state != "T", "lane process group was not resumed"
    finally:
        proc.terminate()
        proc.wait()
