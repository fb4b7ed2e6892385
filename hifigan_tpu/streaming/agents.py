"""Streaming agents: simultaneous S2ST / S2TT / ASR with StreamSpeech
(CTC-progress) and wait-k policies.

Capability parity with the reference agent suite
(``/root/reference/agent/``, SURVEY.md §2.5):

* :class:`S2STAgent`      — ``speech_to_speech.streamspeech.agent.py:101-770``
* :class:`S2TTAgent`      — ``speech_to_text.s2tt.streamspeech.agent.py:101-545``
* :class:`ASRAgent`       — ``speech_to_text.asr.streamspeech.agent.py:103-433``
  (emits the text *delta* beyond what was already committed)
* :class:`WaitkS2STAgent` / :class:`WaitkS2TTAgent` —
  ``speech_to_speech.wait-k-stride-n.agent.py`` (arithmetic budgets)

Each ``policy()`` call re-encodes the full received prefix (the
reference's semantics — only *emission* is incremental) through the
bucketed jitted programs of :class:`~hifigan_tpu.streaming.runtime.S2STInference`.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from hifigan_tpu.streaming.features import FbankConfig, OnlineFbank
from hifigan_tpu.streaming.harness import (
    AgentStates,
    ReadAction,
    SpeechSegment,
    TextSegment,
    WriteAction,
)
from hifigan_tpu.streaming.policy import StreamSpeechPolicy, WaitKPolicy
from hifigan_tpu.streaming.runtime import S2STInference


def default_detokenizer(ids: List[int]) -> str:
    """Fallback id→text mapping when no tokenizer is provided."""
    return " ".join(f"<{i}>" for i in ids)


class _AgentBase:
    def __init__(
        self,
        inference: S2STInference,
        *,
        fbank: Optional[FbankConfig] = None,
        detokenize: Callable[[List[int]], str] = default_detokenizer,
        debug_dir: Optional[str] = None,
    ):
        self.inf = inference
        self.fbank_cfg = fbank or FbankConfig()
        self.detokenize = detokenize
        # reference agents append per-stream debug transcripts
        # (speech_to_speech.streamspeech.agent.py:197-204)
        self.debug_dir = debug_dir
        self.reset()

    def _debug(self, stream: str, text: str):
        if not self.debug_dir:
            return
        import os

        os.makedirs(self.debug_dir, exist_ok=True)
        with open(os.path.join(self.debug_dir, f"{stream}.txt"), "a") as f:
            f.write(text + "\n")

    def reset(self):
        self.extractor = OnlineFbank(self.fbank_cfg)
        self._consumed_samples = 0
        self.committed_text_ids: List[int] = []
        self.emitted_units: List[int] = []
        self.finished = False
        # per-stream KV cache (pruned on retraction; see runtime.DecoderSession)
        self.dec_session = self.inf.new_session()

    def _ingest(self, states: AgentStates):
        new = states.source_samples[self._consumed_samples :]
        if len(new):
            self.extractor.push(new)
            self._consumed_samples = len(states.source_samples)

    def _encode(self, states: AgentStates):
        self._ingest(states)
        frames = self.extractor.frames()
        if frames.shape[0] == 0:
            return None
        return self.inf.encode_prefix(frames)


class ASRAgent(_AgentBase):
    """Streaming ASR: emit the source-CTC text delta
    (reference asr agent ``policy`` :385-433)."""

    def __init__(self, inference, *, min_new_tokens: int = 1, **kw):
        super().__init__(inference, **kw)
        self.min_new_tokens = min_new_tokens

    def reset(self):
        super().reset()
        self.committed_src: List[int] = []

    def policy(self, states: AgentStates):
        enc = self._encode(states)
        if enc is None:
            return ReadAction()
        new = enc["src_tokens"][len(self.committed_src) :]
        if len(new) < self.min_new_tokens and not states.source_finished:
            return ReadAction()
        if not new and states.source_finished:
            self.finished = True
            return WriteAction(TextSegment("", finished=True), finished=True)
        self.committed_src.extend(new)
        self._debug("asr", self.detokenize(new))
        return WriteAction(
            TextSegment(self.detokenize(new), finished=states.source_finished),
            finished=states.source_finished and not new,
        )


class S2TTAgent(_AgentBase):
    """Simultaneous speech-to-text translation with the CTC-progress gate
    (reference s2tt agent ``policy`` :381-545)."""

    def __init__(self, inference, *, stride_n: int = 1, whole_words: bool = False,
                 decode: str = "greedy", hmt_transition: str = "confidence",
                 token_text: Optional[Callable[[int], str]] = None, **kw):
        super().__init__(inference, **kw)
        self.gate = StreamSpeechPolicy(stride_n=stride_n)
        self.whole_words = whole_words
        self.decode = decode  # "greedy" (KV-cached) | "hmt" (simultaneous beam)
        # "confidence" (p_max gate) | "learned" (trained transition head)
        self.hmt_transition = hmt_transition
        # id → subword string (for ▁-boundary detection); defaults to the
        # detokenizer applied to a single id
        self.token_text = token_text or (lambda i: self.detokenize([i]))

    def reset(self):
        super().reset()
        if hasattr(self, "gate"):
            self.gate.reset()
        # HMT mode: resumable beam state + the committed prefix it was
        # seeded with (beams' tokens are continuations beyond hmt_base)
        self.hmt_state = None
        self.hmt_base: List[int] = []

    def _write_budget(self, n_tgt: int) -> int:
        """Subword emission budget from target-CTC progress (reference
        agent.py:495-509): total allowed subwords is
        ``((tgt_ctc_len − k1) // stride_n) · stride_n`` (+1 in
        whole-word mode, since the trailing partial word is trimmed);
        what may be *written now* is that total minus what was already
        committed.  This — not the gate alone — is what rate-limits
        commitment: the decoder may never run ahead of the target-CTC
        length estimate while the source is still open."""
        total = ((n_tgt - self.gate.lagging_k1) // self.gate.stride_n
                 ) * self.gate.stride_n
        if self.whole_words:
            total += 1
        return total - len(self.committed_text_ids)

    def _advance_text_hmt(self, states: AgentStates, enc,
                          budget: Optional[int] = None) -> tuple:
        """HMT-simultaneous beam continuation (reference
        hmt_sim_sequence_generator.py capability): resumable across
        policy calls; beams inconsistent with already-emitted text are
        pruned (emissions cannot be retracted — reference
        sequence_generator.py:93-99 prunes incremental state the same
        way)."""
        cfg = self.inf.cfg
        done_cont = self.committed_text_ids[len(self.hmt_base):]
        st = self.hmt_state
        if st is not None and done_cont:
            keep = [b for b in st.beams
                    if b.tokens[: len(done_cont)] == done_cont]
            fin = [b for b in st.finished
                   if b.tokens[: len(done_cont)] == done_cont]
            if keep or fin:
                st.beams, st.finished = keep, fin
            else:
                st = None
        if st is None:
            self.hmt_base = list(self.committed_text_ids)
            done_cont = []
        if states.source_finished:
            max_new = cfg.max_target_len - 1 - len(self.committed_text_ids)
            if max_new <= 0:
                return [], True
        else:
            max_new = cfg.max_new_tokens
            if budget is not None:
                max_new = min(max_new, budget)
        st = self.inf.continue_text_hmt(
            enc["enc"], self.hmt_base,
            src_len=enc["valid_frames"],
            source_finished=bool(states.source_finished),
            state=st, max_new_tokens=max_new,
            transition=self.hmt_transition,
        )
        self.hmt_state = st
        cont = list(st.best().tokens)
        hit_eos = bool(cont) and cont[-1] == cfg.eos_id
        if hit_eos:
            cont = cont[:-1]
        new_ids = cont[len(done_cont):]
        if budget is not None and not states.source_finished:
            # a resumed beam can hold a longer continuation than this
            # call's budget — never commit past it
            new_ids = new_ids[: max(0, budget)]
        if self.whole_words and not states.source_finished and new_ids:
            from hifigan_tpu.streaming.decode import trim_to_whole_words

            texts = [self.token_text(i) for i in new_ids]
            new_ids = new_ids[: len(trim_to_whole_words(texts))]
        if new_ids:
            self.committed_text_ids.extend(new_ids)
            self._debug("st", self.detokenize(new_ids))
        return new_ids, hit_eos

    def _advance_text(self, states: AgentStates, enc,
                      budget: Optional[int] = None) -> tuple:
        """MT continuation shared by S2TT and S2ST: KV-cached greedy
        decode, EOS fast-drain when the source is finished (reference
        agent.py:519-533 — one policy call drains the rest), and
        whole-word (▁) truncation while the source is still open
        (reference agent.py:540-556).  Returns (new_ids, hit_eos)."""
        if self.decode == "hmt":
            return self._advance_text_hmt(states, enc, budget=budget)
        cfg = self.inf.cfg
        if states.source_finished:
            # drain in ONE policy call: allow the whole remaining buffer
            max_new = cfg.max_target_len - 1 - len(self.committed_text_ids)
            if max_new <= 0:
                return [], True
        else:
            max_new = cfg.max_new_tokens
            if budget is not None:
                max_new = min(max_new, budget)
        new_ids = self.inf.continue_text(
            enc["enc"], self.committed_text_ids,
            max_new_tokens=max_new, session=self.dec_session,
        )
        hit_eos = bool(new_ids) and new_ids[-1] == cfg.eos_id
        if hit_eos:
            new_ids = new_ids[:-1]
        if self.whole_words and not states.source_finished and new_ids:
            from hifigan_tpu.streaming.decode import trim_to_whole_words

            texts = [self.token_text(i) for i in new_ids]
            kept = len(trim_to_whole_words(texts))
            new_ids = new_ids[:kept]
        if new_ids:
            self.committed_text_ids.extend(new_ids)
            self._debug("st", self.detokenize(new_ids))
        return new_ids, hit_eos

    def policy(self, states: AgentStates):
        enc = self._encode(states)
        if enc is None:
            return ReadAction()
        n_src, n_tgt = len(enc["src_tokens"]), len(enc["tgt_tokens"])
        if not self.gate.should_write(n_src, n_tgt, source_finished=states.source_finished):
            return ReadAction()
        budget = None
        if not states.source_finished:
            budget = self._write_budget(n_tgt)
            if budget < 1:
                return ReadAction()
        # record CTC progress once the gate has fired (reference
        # agent.py:489-494 updates the prefix lengths before decoding)
        self.gate.committed(n_src, n_tgt)
        new_ids, hit_eos = self._advance_text(states, enc, budget=budget)
        if not new_ids:
            if states.source_finished:
                self.finished = True
                return WriteAction(TextSegment("", finished=True), finished=True)
            return ReadAction()
        done = states.source_finished and hit_eos
        self.finished = done
        return WriteAction(
            TextSegment(self.detokenize(new_ids), finished=done), finished=done
        )


class S2STAgent(S2TTAgent):
    """Simultaneous S2ST: S2TT gating + MT text tracking + T2U unit
    continuation + unit vocoder with duration-aligned tail emission
    (reference s2st agent ``policy`` :422-770: the MT decode precedes
    unit generation; its committed text is exposed for logging and
    drives the ▁-truncation/EOS-drain semantics).

    ``units_from="encoder"`` (default) is the reference's L2-model wiring
    (T2U over encoder output, /root/reference/
    streamspeech_integration.py:357); its source-time unit CTC stream
    carries the silence signature that lets pau units be reinserted at
    long blank runs (units_from_prefix), which ``"decoder"`` — the MT-
    decoder-features wiring, reference agent.py:638-679 — cannot (its
    T2U frames are a uniform 8 per text token).  Measured end-to-end at
    unit-vocoder step 14400: encoder-fed 21.6 speech ASR-BLEU @ 316 ms
    vs decoder-fed 14.0 @ 338 ms."""

    def __init__(self, inference, *, units_from: str = "encoder", **kw):
        super().__init__(inference, **kw)
        assert units_from in ("decoder", "encoder")
        self.units_from = units_from

    def policy(self, states: AgentStates):
        enc = self._encode(states)
        if enc is None:
            return ReadAction()
        n_src, n_tgt = len(enc["src_tokens"]), len(enc["tgt_tokens"])
        if not self.gate.should_write(n_src, n_tgt, source_finished=states.source_finished):
            return ReadAction()
        budget = None
        if not states.source_finished:
            budget = self._write_budget(n_tgt)
            if budget < 1:
                return ReadAction()
        self.gate.committed(n_src, n_tgt)
        # MT text first (reference ordering, agent.py:519-642); units follow
        self._advance_text(states, enc, budget=budget)
        if self.units_from == "decoder":
            new_units, _total = self.inf.units_from_text(
                enc["enc"], self.committed_text_ids, len(self.emitted_units)
            )
        else:
            new_units, _total = self.inf.units_from_prefix(
                enc["unit_argmax"], len(self.emitted_units)
            )
        if not new_units:
            if states.source_finished:
                self.finished = True
                return WriteAction(
                    SpeechSegment(np.zeros(0, np.float32), finished=True), finished=True
                )
            return ReadAction()
        self.emitted_units.extend(new_units)
        self._debug("unit", " ".join(map(str, new_units)))
        tail = self.inf.synthesize_tail(self.emitted_units, len(new_units))
        done = bool(states.source_finished)
        self.finished = done
        return WriteAction(SpeechSegment(tail, finished=done), finished=done)


class WaitkS2TTAgent(_AgentBase):
    """Wait-k text agent: arithmetic subword budget
    (reference wait-k agent :377-405)."""

    def __init__(self, inference, *, k1: int = 3, n1: int = 1,
                 segment_size_ms: int = 320, **kw):
        super().__init__(inference, **kw)
        self.sched = WaitKPolicy(k1=k1, n1=n1)
        self.segment_size_ms = segment_size_ms

    def policy(self, states: AgentStates):
        enc = self._encode(states)
        if enc is None:
            return ReadAction()
        segments = int(states.source_seconds * 1000 / self.segment_size_ms)
        budget = self.sched.subword_budget(segments, source_finished=states.source_finished)
        allowed = budget - len(self.committed_text_ids)
        if allowed <= 0:
            if states.source_finished:
                self.finished = True
                return WriteAction(TextSegment("", finished=True), finished=True)
            return ReadAction()
        new_ids = self.inf.continue_text(
            enc["enc"], self.committed_text_ids,
            max_new_tokens=min(allowed, self.inf.cfg.max_new_tokens),
            session=self.dec_session,
        )
        hit_eos = bool(new_ids) and new_ids[-1] == self.inf.cfg.eos_id
        if hit_eos:
            new_ids = new_ids[:-1]
        if not new_ids:
            if states.source_finished:
                self.finished = True
                return WriteAction(TextSegment("", finished=True), finished=True)
            return ReadAction()
        self.committed_text_ids.extend(new_ids)
        done = states.source_finished and hit_eos
        self.finished = done
        return WriteAction(TextSegment(self.detokenize(new_ids), finished=done), finished=done)


class WaitkS2STAgent(WaitkS2TTAgent):
    """Wait-k S2ST: unit budget ((subwords − k2)//n2)·n2·unit_per_subword
    then the same unit-vocoder tail emission."""

    def __init__(self, inference, *, k2: int = 1, n2: int = 1,
                 unit_per_subword: int = 10, **kw):
        super().__init__(inference, **kw)
        self.sched.k2 = k2
        self.sched.n2 = n2
        self.sched.unit_per_subword = unit_per_subword

    def policy(self, states: AgentStates):
        enc = self._encode(states)
        if enc is None:
            return ReadAction()
        segments = int(states.source_seconds * 1000 / self.segment_size_ms)
        sub_budget = self.sched.subword_budget(segments, source_finished=states.source_finished)
        unit_budget = self.sched.unit_budget(
            min(sub_budget, len(enc["tgt_tokens"])), source_finished=states.source_finished
        )
        allowed_units = unit_budget - len(self.emitted_units)
        if allowed_units <= 0:
            if states.source_finished:
                self.finished = True
                return WriteAction(
                    SpeechSegment(np.zeros(0, np.float32), finished=True), finished=True
                )
            return ReadAction()
        new_units, _ = self.inf.units_from_prefix(
            enc["unit_argmax"], len(self.emitted_units)
        )
        new_units = new_units[:allowed_units]
        if not new_units:
            if states.source_finished:
                self.finished = True
                return WriteAction(
                    SpeechSegment(np.zeros(0, np.float32), finished=True), finished=True
                )
            return ReadAction()
        self.emitted_units.extend(new_units)
        tail = self.inf.synthesize_tail(self.emitted_units, len(new_units))
        done = bool(states.source_finished)
        self.finished = done
        return WriteAction(SpeechSegment(tail, finished=done), finished=done)
