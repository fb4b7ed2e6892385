"""Simultaneous read/write policies.

Two policies with capability parity to the reference agents:

* :class:`StreamSpeechPolicy` — CTC-progress gate: require at least
  ``stride_n`` *new* tokens on both the source (ASR) and target
  (translation) CTC streams since the last write, else READ
  (``/root/reference/agent/speech_to_speech.streamspeech.agent.py:480-509``),
  with lagging offsets k1/k2 before the first write (``add_args``
  ``:214-326``).
* :class:`WaitKPolicy` — arithmetic wait-k/stride-n schedule: the
  allowed subword budget is ``((segments − k1) // n1) · n1`` and the
  unit budget ``((subwords − k2) // n2) · n2 · unit_per_subword``
  (``/root/reference/agent/speech_to_speech.wait-k-stride-n.agent.py:377-405``).

Policies are pure host-side decision functions over token counts — the
device programs stay shape-static regardless of the decision.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class StreamSpeechPolicy:
    """CTC-progress policy gate."""

    stride_n: int = 1
    lagging_k1: int = 0  # min source CTC tokens before first write
    lagging_k2: int = 0  # min target CTC tokens before first write

    def __post_init__(self):
        self._last_src = 0
        self._last_tgt = 0

    def should_write(self, src_tokens: int, tgt_tokens: int, *, source_finished: bool) -> bool:
        if source_finished:
            return True
        if src_tokens < self.lagging_k1 or tgt_tokens < self.lagging_k2:
            return False
        new_src = src_tokens - self._last_src
        new_tgt = tgt_tokens - self._last_tgt
        return new_src >= self.stride_n and new_tgt >= self.stride_n

    def committed(self, src_tokens: int, tgt_tokens: int) -> None:
        """Record progress after a successful write."""
        self._last_src = src_tokens
        self._last_tgt = tgt_tokens

    def reset(self):
        self._last_src = self._last_tgt = 0


@dataclass
class WaitKPolicy:
    """Arithmetic wait-k / stride-n schedule."""

    k1: int = 3  # source segments to wait before text
    n1: int = 1  # text stride
    k2: int = 1  # subwords to wait before units
    n2: int = 1  # unit stride
    unit_per_subword: int = 10

    def subword_budget(self, source_segments: int, *, source_finished: bool) -> int:
        if source_finished:
            return 1 << 30
        if source_segments < self.k1:
            return 0
        # reference arithmetic: ((seg − k1) // n1) · n1  (wait-k agent :377-379)
        return ((source_segments - self.k1) // self.n1) * self.n1

    def unit_budget(self, emitted_subwords: int, *, source_finished: bool) -> int:
        if source_finished:
            return 1 << 30
        if emitted_subwords < self.k2:
            return 0
        # reference arithmetic: ((subwords − k2) // n2) · n2 · upu (:380-384)
        return ((emitted_subwords - self.k2) // self.n2) * self.n2 * self.unit_per_subword
