"""TensorBoard scalar export (gated on the ``tensorboard`` package).

The reference ships TensorBoard event artifacts from its HF-Trainer runs
(``/root/reference/progressive_training/asr_en_chunk_0/runs/``) and
configures ``tensorboard_dir`` in ``configs/train_config.yaml``.  This
module provides (a) a live :class:`ScalarWriter` used by ``cli train``
alongside ``metrics.jsonl``, and (b) :func:`export_metrics_jsonl` to
render an existing jsonl log into an event file after the fact.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

log = logging.getLogger(__name__)

try:  # gated backend (SURVEY.md §5.3 graceful-degradation idiom)
    from tensorboard.compat.proto.event_pb2 import Event
    from tensorboard.compat.proto.summary_pb2 import Summary
    from tensorboard.summary.writer.event_file_writer import EventFileWriter

    HAVE_TENSORBOARD = True
except Exception:  # pragma: no cover - environment without tensorboard
    HAVE_TENSORBOARD = False


class ScalarWriter:
    """Minimal scalar event writer; no-op when tensorboard is absent."""

    def __init__(self, logdir: str):
        self._writer = None
        if HAVE_TENSORBOARD:
            os.makedirs(logdir, exist_ok=True)
            self._writer = EventFileWriter(logdir)
        else:
            log.warning("tensorboard not available; scalar events disabled")

    def write(self, step: int, scalars: dict, wall_time: Optional[float] = None):
        if self._writer is None:
            return
        summary = Summary(
            value=[
                Summary.Value(tag=k, simple_value=float(v))
                for k, v in scalars.items()
                if isinstance(v, (int, float))
            ]
        )
        event = Event(
            wall_time=wall_time or time.time(), step=int(step), summary=summary
        )
        self._writer.add_event(event)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


_NON_METRIC_KEYS = {"step", "epoch", "wall_s"}


def prune_metrics(metrics_path: str, resume_step: int) -> int:
    """Drop ``metrics.jsonl`` rows with ``step > resume_step``.

    A training run that resumes from an earlier checkpoint (orbax keeps
    only the newest saves, so the latest restorable step can precede the
    last logged one) would otherwise append duplicate, out-of-order step
    rows — corrupting step-ordered consumers like
    :func:`export_metrics_jsonl` and last-line readers.  Rewrites the
    file atomically; returns the number of rows dropped."""
    import os

    if not os.path.exists(metrics_path):
        return 0
    kept, dropped, last = [], 0, -1
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                step = int(json.loads(line).get("step", -1))
            except (json.JSONDecodeError, TypeError, ValueError):
                dropped += 1
                continue
            if step > resume_step or step <= last:
                dropped += 1
            else:
                kept.append(line)
                last = step
    if dropped:
        tmp = metrics_path + ".tmp"
        with open(tmp, "w") as f:
            f.write("".join(l + "\n" for l in kept))
        os.replace(tmp, metrics_path)
    return dropped


def export_metrics_jsonl(metrics_path: str, logdir: str) -> int:
    """Convert a ``metrics.jsonl`` training log into TensorBoard events.

    Returns the number of steps exported."""
    writer = ScalarWriter(logdir)
    n = 0
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            step = int(rec.get("step", n))
            scalars = {k: v for k, v in rec.items() if k not in _NON_METRIC_KEYS}
            writer.write(step, scalars)
            n += 1
    writer.close()
    return n
