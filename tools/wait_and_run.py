"""Opportunistic launcher: probe host speed cheaply, fire a command only on
a window comparable to the round's record (VERDICT r05 #2 recipe, applied
to any measurement command).

The in-bench gate (bench.host_gate) is RELATIVE to its own session best, so
a bench launched during a slow window self-qualifies against a low bar;
this launcher holds an ABSOLUTE bar matched to the qualified-record window
(1-proc cpu spin and 1-proc memory-bus spin), probes every ``interval``
seconds, and execs the command only when ``consecutive`` probes in a row
pass — so the command starts inside a stable window, not on a spike edge.

Usage:
  python tools/wait_and_run.py --min-1p 22000 --min-mem 45 \
      [--budget 7200] [--interval 20] [--consecutive 2] -- CMD ARGS...
Exit code: the command's, or 3 if the budget expired with no window.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-1p", type=int, default=22000)
    ap.add_argument("--min-mem", type=int, default=45)
    ap.add_argument("--budget", type=float, default=7200.0)
    ap.add_argument("--interval", type=float, default=20.0)
    ap.add_argument("--consecutive", type=int, default=2)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    from bench import spin_calibration

    t0 = time.monotonic()
    streak = 0
    while time.monotonic() - t0 < args.budget:
        s1 = spin_calibration(1, dur=2.0)
        s1m = spin_calibration(1, dur=2.0, mem=True)
        ok = s1 >= args.min_1p and s1m >= args.min_mem
        streak = streak + 1 if ok else 0
        print(
            f"[wait_and_run] t={time.monotonic()-t0:7.1f}s spin1p={s1} "
            f"mem1p={s1m} ok={ok} streak={streak}",
            flush=True,
        )
        if streak >= args.consecutive:
            print(f"[wait_and_run] window qualified; exec: {' '.join(cmd)}", flush=True)
            return subprocess.call(cmd)
        time.sleep(args.interval)
    print("[wait_and_run] budget expired, no qualifying window", flush=True)
    return 3


if __name__ == "__main__":
    sys.exit(main())
