"""Beam-search text decoding with prefix continuation and partial
encoder states.

Capability parity with the reference's fairseq-style sequence
generators (SURVEY.md §2.5):

* ``/root/reference/agent/sequence_generator.py:16-687`` — beam search
  with reusable incremental state and ``max_new_tokens``-bounded
  prefix-continuation decoding (``generate_decoder``, ``:165-180``);
* ``/root/reference/agent/mt/hmt_sequence_generator.py:21-1149`` and the
  ``Sim`` variant (``hmt_sim_sequence_generator.py:20-1117``) — the full
  beam loop plus ``bulid_partial_encoder_out`` (sic) which truncates
  encoder states to a source prefix for simultaneous decoding
  (``:755-771``).

TPU design: the whole beam lives on device as a fixed ``[beam,
max_len]`` token buffer; each step is one jitted batched decoder call
(all beams scored together — the host only does the top-k bookkeeping on
``beam×vocab`` scores).  Partial encoder states are a static *mask*, not
a truncation, so every prefix length reuses one compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Tuple

import numpy as np


@dataclass
class BeamHypothesis:
    tokens: List[int]
    score: float  # accumulated log-prob
    finished: bool = False

    def normalized_score(self, length_penalty: float) -> float:
        n = max(1, len(self.tokens))
        return self.score / (n**length_penalty)


def partial_encoder_mask(total_len: int, prefix_len: int) -> np.ndarray:
    """Boolean cross-attention mask ``[1, 1, 1, total_len]`` exposing only
    the source prefix (the ``Sim`` generator's partial encoder-out,
    implemented as a mask so shapes stay static)."""
    m = np.zeros((1, 1, 1, total_len), dtype=bool)
    m[..., :prefix_len] = True
    return m


def beam_search(
    score_fn: Callable[[np.ndarray], np.ndarray],
    *,
    prefix: List[int],
    beam_size: int = 5,
    max_new_tokens: int = 32,
    max_len: int = 128,
    bos_id: int = 1,
    eos_id: int = 2,
    length_penalty: float = 1.0,
    forbidden_ids: Tuple[int, ...] = (),
) -> List[BeamHypothesis]:
    """Prefix-continuation beam search.

    Args:
      score_fn: ``tokens [N, max_len] int32 → log-probs [N, max_len, V]``
        (a jitted causal decoder; position ``i`` scores token ``i+1``).
      prefix: already-committed target tokens (without BOS).
    Returns:
      Hypotheses sorted by normalised score; ``tokens`` contains only the
      *continuation* beyond the prefix.
    """
    seed = [bos_id] + list(prefix)
    n0 = min(len(seed), max_len)
    beams: List[BeamHypothesis] = [BeamHypothesis([], 0.0)]
    finished: List[BeamHypothesis] = []

    for step in range(max_new_tokens):
        live = [b for b in beams if not b.finished]
        if not live:
            break
        tokens = np.zeros((len(live), max_len), np.int32)
        pos = []
        for bi, b in enumerate(live):
            seq = (seed + b.tokens)[:max_len]
            tokens[bi, : len(seq)] = seq
            pos.append(len(seq) - 1)
        logprobs = np.asarray(score_fn(tokens))  # [N, L, V]
        candidates: List[BeamHypothesis] = []
        for bi, b in enumerate(live):
            lp = logprobs[bi, pos[bi]]
            if forbidden_ids:
                lp = lp.copy()
                lp[list(forbidden_ids)] = -np.inf
            top = np.argpartition(-lp, beam_size)[: beam_size + 1]
            for tok in top:
                cand = BeamHypothesis(b.tokens + [int(tok)], b.score + float(lp[tok]))
                if int(tok) == eos_id or len(seed) + len(cand.tokens) >= max_len:
                    cand.finished = True
                    finished.append(cand)
                else:
                    candidates.append(cand)
        candidates.sort(key=lambda h: h.normalized_score(length_penalty), reverse=True)
        beams = candidates[:beam_size]
        # early stop: best finished beats any live upper bound
        if finished and beams:
            best_fin = max(h.normalized_score(length_penalty) for h in finished)
            if best_fin >= beams[0].normalized_score(length_penalty) and step > 0:
                break
    result = finished + beams
    result.sort(key=lambda h: h.normalized_score(length_penalty), reverse=True)
    return result


def greedy_equivalent(score_fn, **kw) -> List[int]:
    """Beam size 1 — sanity path matching greedy decoding."""
    hyps = beam_search(score_fn, beam_size=1, **kw)
    return hyps[0].tokens if hyps else []
