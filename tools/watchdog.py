#!/usr/bin/env python
"""Training watchdog for the remote-relay TPU rig.

The TPU tunnel hard-wedges every ~40-80 min under sustained training
(docs/ROUND_NOTES.md "Rig behaviour"); it recovers on its own after
~10-20 min, but a wedged trainer process never does.  This supervisor:

* launches the trainer command as a child process,
* watches the run's ``metrics.jsonl`` for *step progress* (NOT file
  mtime — compile windows are silent for ~12 min),
* kills and relaunches (the command must be resumable, e.g. carry
  ``--resume``) when no new step appears within the limit
  (``--grace`` seconds after a (re)start to cover compilation,
  ``--limit`` seconds once steps are flowing),
* exits when the child exits cleanly, the target step is reached, or
  ``--max-wall`` elapses (then kills the child and returns 0 so the
  round's remaining pipeline continues).

Usage:
  python tools/watchdog.py --metrics runs/x/metrics.jsonl \
      --grace 1500 --limit 300 --max-wall 14400 -- \
      python -m hifigan_tpu.cli train --resume ...
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def last_step(path: str, offset: int) -> tuple[int | None, int]:
    """Parse new jsonl records past ``offset``; return (max step, new offset)."""
    if not os.path.exists(path):
        return None, offset
    if os.path.getsize(path) < offset:
        # the trainer truncated the file (resume prunes rows past the
        # restored step — cli prune_metrics); a stale offset would seek
        # past EOF and report no progress forever, killing healthy
        # children at the grace limit.  Re-scan from the top.
        offset = 0
    step = None
    with open(path) as f:
        f.seek(offset)
        for line in f:
            if not line.endswith("\n"):
                break  # partial write; re-read next poll
            offset += len(line.encode())
            try:
                rec = json.loads(line)
                step = max(step or 0, int(rec.get("step", 0)))
            except (json.JSONDecodeError, ValueError):
                pass
    return step, offset


def kill_tree(proc: subprocess.Popen) -> None:
    """SIGTERM the child's process group, escalate to SIGKILL."""
    try:
        os.killpg(proc.pid, signal.SIGTERM)
    except ProcessLookupError:
        return
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait(timeout=30)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--grace", type=float, default=1500.0,
                    help="stall limit while no step has appeared yet "
                         "after (re)start (covers compilation)")
    ap.add_argument("--limit", type=float, default=300.0,
                    help="stall limit once steps are flowing")
    ap.add_argument("--max-wall", type=float, default=0.0,
                    help="overall wall-clock budget in seconds (0=none)")
    ap.add_argument("--target-step", type=int, default=0,
                    help="stop once metrics reach this step (0=none)")
    ap.add_argument("--poll", type=float, default=20.0)
    ap.add_argument("--log", default=None,
                    help="child stdout/stderr file (default: inherit)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no trainer command given after --")

    t0 = time.time()
    offset = os.path.getsize(args.metrics) if os.path.exists(args.metrics) else 0
    restarts = 0
    while True:
        logf = open(args.log, "a") if args.log else None
        proc = subprocess.Popen(
            cmd, stdout=logf or None, stderr=subprocess.STDOUT if logf else None,
            start_new_session=True)
        print(f"[watchdog] launched pid={proc.pid} restarts={restarts}",
              flush=True)
        started = time.time()
        last_progress = started
        seen_step = None
        while True:
            time.sleep(args.poll)
            rc = proc.poll()
            step, offset = last_step(args.metrics, offset)
            now = time.time()
            if step is not None and step != seen_step:
                seen_step = step
                last_progress = now
            if rc is not None:
                print(f"[watchdog] child exited rc={rc} at step={seen_step}",
                      flush=True)
                if logf:
                    logf.close()
                if rc == 0:
                    return 0
                break  # relaunch on failure
            if args.target_step and seen_step and seen_step >= args.target_step:
                print(f"[watchdog] target step {args.target_step} reached",
                      flush=True)
                kill_tree(proc)
                if logf:
                    logf.close()
                return 0
            if args.max_wall and now - t0 > args.max_wall:
                print("[watchdog] wall budget exhausted; stopping child",
                      flush=True)
                kill_tree(proc)
                if logf:
                    logf.close()
                return 0
            limit = args.limit if seen_step is not None else args.grace
            if now - last_progress > limit:
                print(f"[watchdog] stall ({now - last_progress:.0f}s > "
                      f"{limit:.0f}s) at step={seen_step}; restarting",
                      flush=True)
                kill_tree(proc)
                if logf:
                    logf.close()
                restarts += 1
                break
        # brief backoff before relaunch (wedge recovery window)
        time.sleep(min(60.0 * restarts, 300.0))


if __name__ == "__main__":
    sys.exit(main())
