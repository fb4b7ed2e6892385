"""Watchdog step-progress parsing (tools/watchdog.py).

The watchdog follows a run's ``metrics.jsonl`` by byte offset.  Round 5
made trainers truncate that file on resume (``prune_metrics`` drops rows
past the restored step), which must not strand the offset past EOF — a
stale offset reads nothing forever and the watchdog kills healthy
children at the grace limit (observed as a TPU kill-loop: every child
restored, trained ~400 steps, and died at ``step=None``).
"""

import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    "watchdog", os.path.join(os.path.dirname(__file__), "..", "tools",
                             "watchdog.py"))
watchdog = importlib.util.module_from_spec(spec)
sys.modules["watchdog"] = watchdog
spec.loader.exec_module(watchdog)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(r + "\n")


def test_last_step_follows_appends(tmp_path):
    p = tmp_path / "metrics.jsonl"
    _write(p, ['{"step": 100}', '{"step": 200}'])
    step, off = watchdog.last_step(str(p), 0)
    assert step == 200
    with open(p, "a") as f:
        f.write('{"step": 300}\n')
    step, off = watchdog.last_step(str(p), off)
    assert step == 300
    # no new rows -> no step
    step, off = watchdog.last_step(str(p), off)
    assert step is None


def test_last_step_survives_truncation(tmp_path):
    """Resume-prune shrinks the file below the follower's offset; the
    watchdog must re-scan from the top instead of seeking past EOF."""
    p = tmp_path / "metrics.jsonl"
    _write(p, ['{"step": %d}' % s for s in range(400, 6000, 400)])
    step, off = watchdog.last_step(str(p), 0)
    assert step == 5600
    # trainer resumes from step 4800: rows past it are pruned
    _write(p, ['{"step": %d}' % s for s in range(400, 5200, 400)])
    assert os.path.getsize(p) < off
    step, off2 = watchdog.last_step(str(p), off)
    assert step == 4800  # re-scanned, not None
    assert off2 == os.path.getsize(p)
    # fresh progress after the resume is seen immediately
    with open(p, "a") as f:
        f.write('{"step": 5200}\n')
    step, _ = watchdog.last_step(str(p), off2)
    assert step == 5200


def test_last_step_ignores_partial_writes(tmp_path):
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        f.write('{"step": 100}\n{"step": 2')  # torn tail
    step, off = watchdog.last_step(str(p), 0)
    assert step == 100
    with open(p, "a") as f:
        f.write('00}\n')
    step, _ = watchdog.last_step(str(p), off)
    assert step == 200
