"""Orbax checkpointing of the full GAN train state.

Capability parity with the reference's three checkpoint APIs
(SURVEY.md §5.4): ``VocoderTrainer.save_checkpoint/load_checkpoint``
persist vocoder + both optimizer states in one file
(``/root/reference/hifigan_modified/complete_vocoder.py:235-248``);
``ConditionedHiFiGAN.save_model`` adds config + model info
(``conditioned_hifigan.py:196-208``).  Here the whole
:class:`~hifigan_tpu.train.state.GanTrainState` pytree (G + D params +
both optimizer states + step) is checkpointed atomically with orbax,
with step-based retention (``save_steps`` cadence per
``/root/reference/configs/train_config.yaml``).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import orbax.checkpoint as ocp

from hifigan_tpu.train.state import GanTrainState


class CheckpointManager:
    """Thin orbax wrapper: ``save(state)`` / ``restore(template)`` /
    ``latest_step()`` with retention of the last N checkpoints."""

    def __init__(self, directory: str, *, max_to_keep: int = 5, save_interval: int = 1):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval,
                create=True,
            ),
        )

    def save(self, state: GanTrainState, *, metadata: Optional[dict] = None, force: bool = False) -> bool:
        step = int(state.step)
        try:
            saved = self._mgr.save(
                step, args=ocp.args.StandardSave(state), force=force
            )
        except Exception as e:  # orbax StepAlreadyExistsError and kin
            if "already exists" in str(e):
                return False
            raise
        if saved and metadata is not None:
            with open(os.path.join(self._dir, f"meta_{step}.json"), "w") as f:
                json.dump(metadata, f, indent=2, default=str)
        return saved

    def restore(self, template: GanTrainState, step: Optional[int] = None) -> GanTrainState:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
