"""Watchdog for the bench pause protocol.

bench.py quiets the host by SIGSTOPping the queue-lane process groups and
dropping ``output/BENCH_RUNNING`` (which contains its pid). If bench is
SIGKILLed mid-measurement, its cleanup never runs: the sentinel would
stall the lanes between items and the stopped groups would stay frozen.
This daemon polls for that state — sentinel present but the recorded
bench pid dead — and repairs it (remove sentinel, SIGCONT the pgids in
``output/queue_pids/``). It never touches anything while the recorded
bench process is alive.

Usage: python -m benchmarking.bench_watchdog   (run in the background)
"""

from __future__ import annotations

import glob
import os
import signal
import time

SENTINEL = os.path.join("output", "BENCH_RUNNING")
PID_DIR = os.path.join("output", "queue_pids")


def _bench_alive() -> bool:
    try:
        with open(SENTINEL) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return False  # unreadable sentinel = not attributable to a live bench
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def repair_if_stale() -> bool:
    """One check; returns True if a repair was performed."""
    if not os.path.exists(SENTINEL) or _bench_alive():
        return False
    try:
        os.remove(SENTINEL)
    except OSError:
        pass
    for path in glob.glob(os.path.join(PID_DIR, "*.pgid")):
        try:
            pgid = int(open(path).read().strip())
            os.killpg(pgid, signal.SIGCONT)
        except (OSError, ValueError, ProcessLookupError, PermissionError):
            continue
    print(f"[watchdog] {time.strftime('%H:%M:%S')} repaired stale bench "
          "sentinel + resumed lanes", flush=True)
    return True


def main() -> None:
    while True:
        repair_if_stale()
        time.sleep(60)


if __name__ == "__main__":
    main()
