"""Streaming simulation harness (SimulEval-compatible semantics).

The reference's agents are driven by the external SimulEval read/write
loop (``/root/reference/agent/*.agent.py``): the harness feeds source
segments, the agent answers with ``ReadAction`` (need more input) or
``WriteAction`` (emit a text/speech segment), and latency is scored from
the source timestamps at which outputs were committed.

This module provides that loop natively — agents implement
``policy(state) → ReadAction | WriteAction`` over an
:class:`AgentStates`-like blackboard — plus Average-Lagging accounting,
so the whole simultaneous stack is testable without the external
dependency.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Protocol, Union

import numpy as np


@dataclass
class SpeechSegment:
    samples: np.ndarray
    sample_rate: int = 16_000
    finished: bool = False


@dataclass
class TextSegment:
    content: str
    finished: bool = False


@dataclass
class ReadAction:
    pass


@dataclass
class WriteAction:
    segment: Union[SpeechSegment, TextSegment]
    finished: bool = False


@dataclass
class AgentStates:
    """The blackboard visible to a streaming agent."""

    source_samples: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    source_sample_rate: int = 16_000
    source_finished: bool = False
    target_segments: List[Union[SpeechSegment, TextSegment]] = field(default_factory=list)

    @property
    def source_seconds(self) -> float:
        return len(self.source_samples) / self.source_sample_rate


class StreamingAgent(Protocol):
    def reset(self) -> None: ...

    def policy(self, states: AgentStates) -> Union[ReadAction, WriteAction]: ...


@dataclass
class SessionResult:
    outputs: List[Union[SpeechSegment, TextSegment]]
    emission_source_seconds: List[float]  # source time at each write
    source_seconds: float

    @property
    def text(self) -> str:
        return " ".join(
            s.content for s in self.outputs if isinstance(s, TextSegment)
        ).strip()

    @property
    def waveform(self) -> np.ndarray:
        chunks = [s.samples for s in self.outputs if isinstance(s, SpeechSegment)]
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    def _token_delays(self) -> List[float]:
        """Per-target-token source delays d_i (seconds of source consumed
        when token i was committed).  A write of k tokens at source time
        t contributes k delays of t.  Text sessions count whitespace
        tokens; speech sessions count 20 ms output units (the reference's
        emission granularity, agent.py:750)."""
        text_mode = any(
            isinstance(s, TextSegment) and s.content.strip() for s in self.outputs
        )
        delays: List[float] = []
        for seg, t in zip(self.outputs, self.emission_source_seconds):
            if text_mode:
                if isinstance(seg, TextSegment):
                    delays.extend([t] * len(seg.content.split()))
            elif isinstance(seg, SpeechSegment) and len(seg.samples):
                k = max(1, int(round(len(seg.samples) / seg.sample_rate / 0.02)))
                delays.extend([t] * k)
        return delays

    @property
    def average_lagging_ms(self) -> float:
        """Average Lagging (Ma et al., 2019 — SimulEval's scorer, the
        reference's AL metric: configs/eval_config.yaml metrics.lagging):

            AL = (1/τ) · Σ_{i=1..τ} (d_i − (i−1)/γ),   γ = |Y| / |X|

        where d_i is the source time consumed at the commitment of
        target token i, |X| the source duration, |Y| the target length,
        and τ the first token committed after the full source was read.
        Unclamped per-term — an over-aggressive policy that commits
        everything up front shows a small (possibly negative) AL, it is
        not hidden by a max(0, ·)."""
        delays = self._token_delays()
        if not delays:
            return 0.0
        x = self.source_seconds
        y = len(delays)
        if x <= 0:
            return 0.0
        gamma = y / x
        tau = next((i + 1 for i, d in enumerate(delays) if d >= x), y)
        al = sum(delays[i] - i / gamma for i in range(tau)) / tau
        return 1000.0 * float(al)


def run_streaming_session(
    agent: StreamingAgent,
    source_audio: np.ndarray,
    *,
    sample_rate: int = 16_000,
    segment_size_ms: int = 320,
    max_steps: int = 10_000,
) -> SessionResult:
    """Drive an agent with fixed-size source segments (SimulEval's
    ``source_segment_size``, default 320 ms as in the reference agent
    args) until it finishes."""
    agent.reset()
    states = AgentStates(source_sample_rate=sample_rate)
    seg_len = sample_rate * segment_size_ms // 1000
    cursor = 0
    outputs: List[Union[SpeechSegment, TextSegment]] = []
    emission_ts: List[float] = []
    for _ in range(max_steps):
        action = agent.policy(states)
        if isinstance(action, WriteAction):
            outputs.append(action.segment)
            emission_ts.append(states.source_seconds)
            if action.finished:
                break
            continue
        # ReadAction: feed the next source segment
        if cursor >= len(source_audio):
            if states.source_finished:
                # agent keeps reading after EOS: force stop
                break
            states.source_finished = True
            continue
        nxt = source_audio[cursor : cursor + seg_len]
        cursor += len(nxt)
        states.source_samples = np.concatenate([states.source_samples, nxt])
        if cursor >= len(source_audio):
            states.source_finished = True
    return SessionResult(
        outputs=outputs,
        emission_source_seconds=emission_ts,
        source_seconds=len(source_audio) / sample_rate,
    )
