"""Driver-order replay gate (judge r8 item #4): the driver's
correctness run executes ``queries()`` window-first — consumers before
their builders — while bench and check_oracle execute ``exec_order()``
(builders first).  Result-order coupling (a persisted memo whose plan
differs cold vs warm, an order-coupled staged artifact) is invisible
to every exec_order gate, so this replays the driver's exact procedure
in a FRESH subprocess (order coupling is session-state coupling; a
shared test session would mask it).

Always-on: the 50-entry driver window at sf0.001 (~2-3 min — the
window is the only segment whose order changes per round, so it is
where coupling bites first).  Full suite at sf0.01 (~10-15 min):
SPARK_GRAFT_REPLAY_FULL=1.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPLAY = os.path.join(REPO_ROOT, "tools", "replay_driver_order.py")


def _run(args: list[str]) -> None:
    proc = subprocess.run(
        [sys.executable, REPLAY, *args],
        capture_output=True,
        text=True,
        timeout=3000,
        cwd=REPO_ROOT,
    )
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    assert proc.returncode == 0, (
        f"driver-order replay failed (rc={proc.returncode}):\n"
        f"{tail}\n{proc.stderr[-2000:]}"
    )
    assert "FAILURES: 0" in proc.stdout, tail


def test_driver_window_replays_green_in_driver_order():
    _run(["/root/testdata/sf0.001", "--window-only"])


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_REPLAY_FULL") != "1",
    reason="full sf0.01 driver-order replay is opt-in "
    "(SPARK_GRAFT_REPLAY_FULL=1; ~10-15 min)",
)
def test_full_suite_replays_green_in_driver_order():
    _run(["/root/testdata/sf0.01"])
