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
    row: int = 0  # KV-cache row of this hypothesis (kv_beam_search)

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


def kv_beam_search(
    first_logprobs: np.ndarray,
    step_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    *,
    seed_len: int,
    beam_size: int = 5,
    max_new_tokens: int = 32,
    max_len: int = 128,
    eos_id: int = 2,
    length_penalty: float = 1.0,
    forbidden_ids: Tuple[int, ...] = (),
) -> List[BeamHypothesis]:
    """KV-cached beam search (the reference's incremental-state beam —
    ``/root/reference/agent/sequence_generator.py:93-99`` with
    ``reorder_incremental_state``; here the cache reorder is
    :func:`hifigan_tpu.streaming.incremental.gather_beams`).

    The caller prefilled the seed into a ``[beam_size, max_len]`` cache
    (all rows identical) and supplies:

    * ``first_logprobs [V]`` — next-token log-probs after the seed;
    * ``step_fn(tokens [beam], parents [beam]) → log-probs [beam, V]``
      — gathers the cache rows by ``parents``, commits ``tokens`` and
      returns each row's next-token distribution.  O(max_len) per
      *step*, independent of how many tokens precede it.

    Same host bookkeeping/scoring semantics as :func:`beam_search`
    (parity-tested), so results match the full-recompute path.
    Returns hypotheses sorted by normalised score; ``tokens`` is the
    continuation beyond the seed."""

    def masked(lp: np.ndarray) -> np.ndarray:
        if forbidden_ids:
            lp = lp.copy()
            lp[list(forbidden_ids)] = -np.inf
        return lp

    finished: List[BeamHypothesis] = []
    beams: List[BeamHypothesis] = []
    lp0 = masked(np.asarray(first_logprobs))
    for tok in np.argpartition(-lp0, min(beam_size, lp0.size - 1))[: beam_size + 1]:
        cand = BeamHypothesis([int(tok)], float(lp0[tok]), row=0)
        if int(tok) == eos_id or seed_len + 1 >= max_len:
            cand.finished = True
            finished.append(cand)
        else:
            beams.append(cand)
    beams.sort(key=lambda h: h.score, reverse=True)
    beams = beams[:beam_size]

    for step in range(1, max_new_tokens):
        if not beams:
            break
        tokens = np.zeros(beam_size, np.int32)
        parents = np.zeros(beam_size, np.int32)
        for i, b in enumerate(beams):
            tokens[i] = b.tokens[-1]
            parents[i] = b.row
        logprobs = np.asarray(step_fn(tokens, parents))  # [beam, V]
        candidates: List[BeamHypothesis] = []
        for i, b in enumerate(beams):
            lp = masked(logprobs[i])
            top = np.argpartition(-lp, min(beam_size, lp.size - 1))[: beam_size + 1]
            for tok in top:
                cand = BeamHypothesis(
                    b.tokens + [int(tok)], b.score + float(lp[tok]), row=i)
                if int(tok) == eos_id or seed_len + len(cand.tokens) >= max_len:
                    cand.finished = True
                    finished.append(cand)
                else:
                    candidates.append(cand)
        candidates.sort(key=lambda h: h.normalized_score(length_penalty),
                        reverse=True)
        beams = candidates[:beam_size]
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


# --------------------------------------------------------------------------
# HMT-class simultaneous beam search
# --------------------------------------------------------------------------
#
# Capability parity with the reference's hidden-Markov-transformer
# generators (``/root/reference/agent/mt/hmt_sim_sequence_generator.py``):
# per write step the decoder is evaluated at several candidate *read
# positions* (translation states — ``cands_per_token``, ``:365-366``),
# a per-state confidence decides READ vs WRITE (transition probs,
# ``:449-470``), hypotheses are scored jointly over (read position,
# token) (``:487-499``), reads are monotone per beam (``:490-495``),
# and decoding is resumable across policy calls — when every live beam
# wants source that has not arrived yet the generator returns a
# read-request instead of forcing an emission (``return_read_flag``,
# ``:435-440, 500-503``).
#
# TPU-first redesign: instead of the reference's per-state Python loop
# with incremental torch state, ALL beams × ALL candidate read
# positions are scored in ONE batched jitted decoder call — the read
# prefix is a per-row cross-attention *mask* (static shapes, one
# compiled program for every prefix length).  The learned transition
# head is replaced by a confidence gate on the decoder distribution
# itself (max token probability ≥ ``write_threshold``) plus an explicit
# per-read penalty in the joint score — the same READ/WRITE semantics
# without a second trained module.


@dataclass
class HmtHypothesis:
    tokens: List[int]          # continuation beyond the committed prefix
    score: float               # joint log-prob incl. read penalties
    num_read: int              # source positions consumed so far (monotone)
    reads: List[int]           # read position at which each token was written
    finished: bool = False
    row: int = 0               # KV-cache row (stepper mode)

    def normalized_score(self, length_penalty: float) -> float:
        n = max(1, len(self.tokens))
        return self.score / (n**length_penalty)


@dataclass
class HmtBeamState:
    """Resumable decode state carried across policy calls."""

    beams: List[HmtHypothesis]
    finished: List[HmtHypothesis]
    need_read: bool = False    # all live beams want unseen source

    def best(self, length_penalty: float = 1.0) -> HmtHypothesis:
        pool = self.finished + self.beams
        return max(pool, key=lambda h: h.normalized_score(length_penalty))


def hmt_beam_search(
    score_fn,
    *,
    stepper=None,
    prefix: List[int],
    src_len: int,
    source_finished: bool,
    state: "HmtBeamState | None" = None,
    beam_size: int = 4,
    cands_per_token: int = 4,
    read_stride: int = 1,
    max_new_tokens: int = 32,
    max_len: int = 128,
    bos_id: int = 1,
    eos_id: int = 2,
    write_threshold: float = 0.5,
    read_penalty: float = 0.1,
    length_penalty: float = 1.0,
    min_read: int = 1,
) -> HmtBeamState:
    """One resumable HMT-beam decode pass.

    Args:
      score_fn: ``(tokens [N, max_len] int32, read_lens [N] int) →
        log-probs [N, max_len, V]`` — a causal decoder evaluated with the
        source masked to ``read_lens[i]`` positions for row ``i``.  May
        instead return ``(log-probs, write_probs [N, max_len])`` — then
        the READ/WRITE gate uses the **learned transition head**
        (reference ``hmt_sim_sequence_generator.py:449-470``) instead of
        the max-token-probability confidence heuristic.
      prefix: committed target tokens (without BOS) — hypotheses continue
        beyond it.
      src_len: source positions available *now*; reads never exceed it.
      source_finished: when False, EOS is suppressed and the search may
        return early with ``need_read=True`` instead of writing
        low-confidence tokens (the reference's ``return_read_flag``).
      state: resume from a previous pass (beams keep tokens/reads/scores).
      stepper: optional KV-cached scorer (``prefill``/``step`` protocol —
        :class:`hifigan_tpu.streaming.runtime._HmtKvStepper`); replaces
        ``score_fn``'s full re-decode with O(max_len) incremental steps.

    Returns the updated :class:`HmtBeamState`.
    """
    seed = [bos_id] + list(prefix)
    if state is None:
        state = HmtBeamState(
            beams=[HmtHypothesis([], 0.0, min(max(1, min_read), max(1, src_len)), [])],
            finished=[],
        )
    state.need_read = False
    prefilled = False
    if source_finished:
        # drain semantics: the WHOLE source is in hand, so reading it is
        # free (the reference drain decodes with full context).  Without
        # this, beams whose gate defers writes must climb to src_len at
        # ≤ (cands_per_token−1)·read_stride reads per iteration and
        # starve the write budget entirely (observed: a functional
        # learned gate produced near-empty drains, F1 ≈ 0.11).
        for b in state.beams + state.finished:
            b.num_read = max(b.num_read, src_len)

    for _ in range(max_new_tokens):
        live = [b for b in state.beams if not b.finished]
        if not live:
            break
        # candidate read positions per beam: num_read, +stride, … (clamped,
        # padded by repetition so the batch shape is static)
        row_meta = []  # (beam index, read_len)
        if stepper is not None:
            if not prefilled:
                n = min(len(seed) + len(live[0].tokens), max_len)
                toks = np.zeros((stepper.beam_rows, max_len), np.int32)
                reads0 = np.ones(stepper.beam_rows, np.int32)
                for bi, b in enumerate(live):
                    seq = (seed + b.tokens)[:max_len]
                    toks[bi, : len(seq)] = seq
                    reads0[bi] = max(1, b.num_read)
                    b.row = bi
                stepper.prefill(toks, reads0, n)
                prefilled = True
            R = stepper.step_rows
            last_toks = np.zeros(R, np.int32)
            parents = np.zeros(R, np.int32)
            rows_read = np.ones(R, np.int64)
            for bi, b in enumerate(live):
                seq = (seed + b.tokens)[:max_len]
                for k in range(cands_per_token):
                    # incremental HMT rungs, plus a final jump-to-now
                    # rung: source already received is free context
                    r = (src_len if k == cands_per_token - 1
                         else min(src_len, b.num_read + k * read_stride))
                    row = bi * cands_per_token + k
                    last_toks[row] = seq[-1]
                    parents[row] = b.row
                    rows_read[row] = max(1, r)
                    row_meta.append((bi, r))
            logprobs, write_probs = stepper.step(last_toks, parents, rows_read)
        else:
            rows_tokens = np.zeros((len(live) * cands_per_token, max_len), np.int32)
            rows_read = np.zeros(len(live) * cands_per_token, np.int64)
            for bi, b in enumerate(live):
                seq = (seed + b.tokens)[:max_len]
                for k in range(cands_per_token):
                    r = (src_len if k == cands_per_token - 1
                         else min(src_len, b.num_read + k * read_stride))
                    row = bi * cands_per_token + k
                    rows_tokens[row, : len(seq)] = seq
                    rows_read[row] = max(1, r)
                    row_meta.append((bi, r))
            scored = score_fn(rows_tokens, rows_read)
            write_probs = None
            if isinstance(scored, tuple):
                logprobs, write_probs = scored
                logprobs = np.asarray(logprobs)
                write_probs = np.asarray(write_probs)
            else:
                logprobs = np.asarray(scored)
        pos = [min(len(seed + b.tokens), max_len) - 1 for b in live]

        candidates: List[HmtHypothesis] = []
        beam_confident = [False] * len(live)
        for row, (bi, r) in enumerate(row_meta):
            b = live[bi]
            if stepper is not None:
                lp = logprobs[row].copy()
            else:
                lp = logprobs[row, pos[bi]].copy()
            if not source_finished:
                lp[eos_id] = -np.inf
            if write_probs is not None:
                # learned transition gate p(write | state, read prefix)
                p_gate = (float(write_probs[row]) if stepper is not None
                          else float(write_probs[row, pos[bi]]))
            else:
                p_gate = float(np.exp(lp.max()))
            fully_read = r >= src_len
            confident = p_gate >= write_threshold or (fully_read and source_finished)
            if confident:
                beam_confident[bi] = True
            elif not fully_read:
                continue  # this state prefers READ — skip its writes
            elif not source_finished:
                continue  # would need unseen source
            top = np.argpartition(-lp, min(beam_size + 1, lp.size - 1))[: beam_size + 1]
            for tok in top:
                if not np.isfinite(lp[tok]):
                    continue
                cand = HmtHypothesis(
                    b.tokens + [int(tok)],
                    b.score + float(lp[tok]) - read_penalty * (r - b.num_read),
                    r,
                    b.reads + [r],
                    row=row,
                )
                if int(tok) == eos_id or len(seed) + len(cand.tokens) >= max_len:
                    cand.finished = True
                candidates.append(cand)

        if not candidates:
            # every live beam wants more source than has arrived
            if not source_finished:
                state.need_read = True
                return state
            break

        # beams whose every candidate state lacked confidence still advance
        # their read pointer so the next pass looks further into the source
        for bi, conf in enumerate(beam_confident):
            if not conf:
                live[bi].num_read = min(
                    src_len, live[bi].num_read + cands_per_token * read_stride)

        candidates.sort(key=lambda h: h.normalized_score(length_penalty), reverse=True)
        new_beams: List[HmtHypothesis] = []
        for cand in candidates:
            if cand.finished:
                state.finished.append(cand)
            else:
                new_beams.append(cand)
            if len(new_beams) >= beam_size:
                break
        if not new_beams:
            break
        state.beams = new_beams
        if state.finished:
            best_fin = max(h.normalized_score(length_penalty) for h in state.finished)
            if best_fin >= state.beams[0].normalized_score(length_penalty):
                break
    return state
