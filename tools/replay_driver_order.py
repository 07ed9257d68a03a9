"""Standing DRIVER-ORDER replay gate (judge r8 item #4).

The driver's correctness run executes ``queries()`` in ITS order —
window-first, so consumers run before their builders and every
memoized artifact is built on demand at whatever point the window
samples it.  bench and tools/check_oracle.py execute ``exec_order()``
(builders first) instead, so an entry whose RESULT silently depends on
execution order — a persisted memo whose plan differs cold vs warm
(the round-6 persisted-memo bug), a staged artifact with an
order-coupled writer (the round-8 staging-order coupling) — can be
green in every exec_order gate and still fail the driver.  This script
replays the exact driver procedure so that class of regression has a
standing local gate instead of a per-round one-off note:

    python tools/replay_driver_order.py                      # full suite, sf0.01
    python tools/replay_driver_order.py /root/testdata/sf0.001 --window-only

``--window-only`` replays just the first 50 entries (the driver's
CORRECTNESS window — where order coupling bites first, since that is
the only segment whose order differs per round).  Runtime: the window
at sf0.001 is the always-on pytest gate (~2-3 min, fresh subprocess);
the full 249-entry sf0.01 replay (~10-15 min) runs via
SPARK_GRAFT_REPLAY_FULL=1 pytest or directly per round.

Comparison machinery is tools/check_oracle.py's (same DuckDB value
oracle, same normalization); only the execution order differs.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
import check_oracle  # noqa: E402


def main() -> int:
    window_only = "--window-only" in sys.argv
    sys.argv = [a for a in sys.argv if a != "--window-only"]
    names = list(entrymod.queries())
    if window_only:
        names = names[: len(entrymod._DRIVER_WINDOW)]
    print(
        f"driver-order replay: {len(names)} entries"
        + (" (window only)" if window_only else ""),
        file=sys.stderr,
    )
    return check_oracle.main(order_names=names)


if __name__ == "__main__":
    raise SystemExit(main())
