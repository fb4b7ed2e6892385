"""Streaming runtime: online feature extraction, CTC decoding, read/write
policies, the simulation harness, and the incremental S2ST pipeline.

This is the TPU-native counterpart of the reference's SimulEval agent
stack (``/root/reference/agent/``, SURVEY.md §2.5): the policy logic runs
host-side over jitted fixed-shape device programs (bucketed source
lengths, masked decoding), so each streaming step reuses a compiled
program instead of recompiling on every prefix length.
"""

from hifigan_tpu.streaming.features import OnlineFbank, FbankConfig
from hifigan_tpu.streaming.decode import ctc_greedy_collapse, ctc_prefix_frames
from hifigan_tpu.streaming.policy import StreamSpeechPolicy, WaitKPolicy
from hifigan_tpu.streaming.harness import (
    ReadAction,
    WriteAction,
    SpeechSegment,
    TextSegment,
    run_streaming_session,
)

__all__ = [
    "OnlineFbank",
    "FbankConfig",
    "ctc_greedy_collapse",
    "ctc_prefix_frames",
    "StreamSpeechPolicy",
    "WaitKPolicy",
    "ReadAction",
    "WriteAction",
    "SpeechSegment",
    "TextSegment",
    "run_streaming_session",
]
