"""CTC decoding primitives for streaming policies.

Capability parity with ``/root/reference/agent/ctc_decoder.py:30-111``
(argmax CTC with blank/repeat collapse and per-token frame indices — the
policy counts token *progress* across encoder prefixes) and
``/root/reference/agent/ctc_generator.py:26-123`` (prefix-continuation
unit CTC).

The argmax runs on device inside the jitted encoder program; the cheap
collapse runs host-side on the small id sequence (numpy), which keeps
the device program shape-static.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def ctc_greedy_collapse(
    ids: Sequence[int], blank: int = 0
) -> Tuple[List[int], List[int]]:
    """Collapse repeats then remove blanks.

    Returns (tokens, frame_indices): ``frame_indices[i]`` is the first
    frame at which token i appears (reference ``_ctc_postprocess_index``,
    ctc_decoder.py:79-89) — the signal used to align emissions to source
    time.
    """
    tokens: List[int] = []
    frames: List[int] = []
    prev = None
    for t, i in enumerate(np.asarray(ids).reshape(-1).tolist()):
        if i != prev:
            if i != blank:
                tokens.append(int(i))
                frames.append(t)
            prev = i
    return tokens, frames


def ctc_prefix_frames(
    ids: Sequence[int], prefix_len: int, blank: int = 0
) -> Tuple[List[int], int]:
    """Prefix-continuation decode: collapse the full argmax sequence and
    return (new_tokens_beyond_prefix, total_token_count) (reference
    ctc_generator.py:103-107 keeps previously emitted units fixed and
    appends only the continuation)."""
    tokens, _ = ctc_greedy_collapse(ids, blank)
    return tokens[prefix_len:], len(tokens)


def trim_to_whole_words(
    tokens: List[str], *, word_boundary_marker: str = "▁"
) -> List[str]:
    """Drop a trailing incomplete word: keep tokens up to (excluding) the
    last boundary-marked token, so only whole words are emitted
    (reference whole-word truncation,
    agent/speech_to_speech.streamspeech.agent.py:540-556)."""
    last_boundary = None
    for i in range(len(tokens) - 1, -1, -1):
        if tokens[i].startswith(word_boundary_marker):
            last_boundary = i
            break
    if last_boundary is None:
        return []
    return tokens[:last_boundary]
