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
    ids: Sequence[int], prefix_len: int, blank: int = 0,
    silence_gap: int | None = None,
) -> Tuple[List[int], int]:
    """Prefix-continuation decode: collapse the full argmax sequence and
    return (new_tokens_beyond_prefix, total_token_count) (reference
    ctc_generator.py:103-107 keeps previously emitted units fixed and
    appends only the continuation).

    ``silence_gap`` (unit streams only): the unit vocabulary uses id 0
    both as the CTC blank and as the pau/silence unit, so a plain
    collapse can never emit silence — synthesized words run together and
    inter-word pauses vanish (measured −10 ASR-BLEU at the unit-vocoder
    ceiling).  The blank-run length between consecutive emitted units
    separates cleanly (intra-word gaps 7–25 frames vs pause gaps 129+ on
    the trained stack), so when the gap between two units (or before the
    first) exceeds ``silence_gap`` frames, one pau unit (= ``blank``) is
    reinserted; the duration predictor, trained on pau-bearing teacher
    sequences, then gives it a realistic length.  Insertion is
    prefix-stable: the pau between tokens i and i+1 exists exactly when
    token i+1 first appears, so previously emitted prefixes never
    change."""
    tokens, frames = ctc_greedy_collapse(ids, blank)
    if silence_gap is not None and tokens:
        out: List[int] = []
        prev_f = 0  # leading pau only when speech onset itself is late
        for tok, f in zip(tokens, frames):
            if f - prev_f > silence_gap:
                out.append(blank)
            out.append(tok)
            prev_f = f
        tokens = out
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
