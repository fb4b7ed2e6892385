"""Incremental S2ST inference runtime.

The device-side counterpart of the reference agent's per-step pipeline
(``/root/reference/agent/speech_to_speech.streamspeech.agent.py:422-770``):

    fbank(prefix) → chunked encoder → {source CTC, target CTC} argmax
    → policy gate → bounded greedy continuation of the text decoder
    → T2U unit CTC with unit-prefix continuation → unit vocoder
    → emit only the new duration-aligned waveform tail.

TPU execution model: every device program has **static shapes** —
source frames are padded to chunk-aligned buckets (valid because the
chunked-causal encoder never lets padding influence earlier frames),
the text decoder runs on a fixed ``max_target_len`` token buffer with a
causal mask, and the unit vocoder expands durations to a static maximum
(:func:`hifigan_tpu.models.code_vocoder.expand_by_durations`).  A whole
streaming session therefore reuses a handful of compiled programs
instead of recompiling per prefix length (the reference recompiles
nothing but re-runs the full prefix each step — we keep that simple
recompute semantics, just bucketed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.models.code_vocoder import CodeVocoder
from hifigan_tpu.models.streamspeech import StreamSpeechS2ST
from hifigan_tpu.streaming import incremental as inc
from hifigan_tpu.streaming.decode import ctc_greedy_collapse, ctc_prefix_frames

Array = jax.Array


class DecoderSession:
    """Per-stream incremental decoding state: the self-attention KV cache
    plus the token sequence it encodes (BOS + committed prefix).  Kept
    across policy calls; pruned on retraction (reference
    ``agent/sequence_generator.py:93-99, 181-194``)."""

    def __init__(self, inf: "S2STInference"):
        self.inf = inf
        self.cache = inc.init_cache(inf.decoder_spec, 1, inf.cfg.max_target_len)
        self.tokens: List[int] = []

    def sync(self, ckv, seq: List[int]):
        """Make the cache encode exactly ``seq`` and return the
        next-token logits ``[1, vocab]``.  The longest common prefix is
        kept; a retraction lowers the write index; a gap > 1 token is
        refilled with one fused ``prefill`` program; when the cache is
        already exact, one idempotent re-step of the last token
        recovers the logits."""
        common = 0
        for a, b in zip(self.tokens, seq):
            if a != b:
                break
            common += 1
        if common < len(self.tokens):
            self.cache = inc.with_index(self.cache, common)
            self.tokens = self.tokens[:common]
        gap = seq[common:]
        if not gap:
            # re-run the last position (writes identical K/V — idempotent)
            logits, self.cache = self.inf._decode_incr(
                self.inf.params, ckv,
                inc.with_index(self.cache, len(self.tokens) - 1),
                jnp.asarray([self.tokens[-1]], jnp.int32),
            )
            return logits
        if len(gap) == 1:
            logits, self.cache = self.inf._decode_incr(
                self.inf.params, ckv, self.cache,
                jnp.asarray([gap[0]], jnp.int32),
            )
        else:
            n = min(len(seq), self.inf.cfg.max_target_len)
            buf = np.zeros((1, self.inf.cfg.max_target_len), np.int32)
            buf[0, :n] = seq[:n]
            all_logits, cache = self.inf._prefill(
                self.inf.params, ckv, jnp.asarray(buf), self.cache
            )
            self.cache = inc.with_index(cache, n)
            logits = all_logits[:, n - 1]
        self.tokens = list(seq)
        return logits


class _HmtKvStepper:
    """KV-cached scorer for :func:`hifigan_tpu.streaming.beam.hmt_beam_search`.

    ``prefill(tokens, read_lens, n)`` fills a fresh cache for the
    committed prefix (per-row read masks); ``step(last_tokens, parents,
    read_lens)`` gathers cache rows by beam parent, (re-)processes each
    row's last token under its candidate read mask, and returns
    next-token log-probs (+ learned write probabilities).  Mirrors the
    reference's incremental HMT-Sim decoding
    (``/root/reference/agent/mt/hmt_sim_sequence_generator.py`` with
    fairseq incremental states)."""

    def __init__(self, inf: "S2STInference", enc, *, learned: bool,
                 beam_rows: int, step_rows: int):
        self.inf = inf
        self.enc = enc
        self.learned = learned
        self.beam_rows = beam_rows
        self.step_rows = step_rows
        self.ckv = inf._cross_kv(inf.params, enc)
        self.cache = None

    def prefill(self, tokens: np.ndarray, read_lens: np.ndarray, n: int):
        cache = inc.init_cache(self.inf.decoder_spec, tokens.shape[0],
                               self.inf.cfg.max_target_len)
        cache = self.inf._hmt_prefill(
            self.inf.params, self.ckv, jnp.asarray(tokens, jnp.int32),
            cache, jnp.asarray(np.maximum(read_lens, 1), jnp.int32))
        # the last committed position is re-stepped under candidate
        # read masks in the first beam iteration
        self.cache = inc.with_index(cache, max(n - 1, 0))

    def step(self, last_tokens: np.ndarray, parents: np.ndarray,
             read_lens: np.ndarray):
        fn = (self.inf._hmt_kv_step_learned if self.learned
              else self.inf._hmt_kv_step_conf)
        lp, wp, self.cache = fn(
            self.inf.params, self.ckv, self.cache,
            jnp.asarray(last_tokens, jnp.int32),
            jnp.asarray(parents, jnp.int32),
            jnp.asarray(np.maximum(read_lens, 1), jnp.int32))
        return np.asarray(lp), (np.asarray(wp) if wp is not None else None)


def _bucket(n: int, align: int, buckets: Sequence[int]) -> int:
    n = ((n + align - 1) // align) * align
    for b in buckets:
        if b >= n:
            return b
    return n


@dataclass
class S2STInferenceConfig:
    source_buckets: tuple = (32, 64, 128, 256, 512, 1024)
    max_target_len: int = 128
    max_new_tokens: int = 8
    bos_id: int = 1
    eos_id: int = 2
    ctc_blank: int = 0
    # encoder-fed unit streams: reinsert one pau unit where the blank run
    # between consecutive units exceeds this many T2U frames (None=off).
    # The unit vocab conflates pau with the CTC blank, so a plain
    # collapse mutes every inter-word pause (see decode.ctc_prefix_frames)
    unit_silence_gap: Optional[int] = 64


class S2STInference:
    """Jitted sub-programs over a StreamSpeechS2ST + CodeVocoder pair."""

    def __init__(
        self,
        model: StreamSpeechS2ST,
        params,
        code_vocoder: Optional[CodeVocoder] = None,
        code_params=None,
        cfg: S2STInferenceConfig = S2STInferenceConfig(),
    ):
        self.model = model
        self.params = params
        self.code_vocoder = code_vocoder
        self.code_params = code_params
        self.cfg = cfg
        self.chunk = model.config.chunk_size

        @jax.jit
        def _encode(params, mel):
            """mel [1, T_bucket, n_mels] → (enc, src_ids, tgt_ids, unit_ids)."""
            enc = model.apply(params, mel, chunked=True,
                              method=lambda m, x, chunked: m.encoder(x, chunked=chunked))
            src = model.apply(params, enc, method=lambda m, e: m.source_ctc(e))
            tgt = model.apply(params, enc, method=lambda m, e: m.target_ctc(e))
            units = model.apply(params, enc, method=lambda m, e: m.t2u_encoder(e))
            return (
                enc,
                jnp.argmax(src, axis=-1),
                jnp.argmax(tgt, axis=-1),
                jnp.argmax(units, axis=-1),
            )

        self._encode = _encode

        @jax.jit
        def _decode_step(params, enc, tokens):
            """Full causal re-decode over the fixed token buffer; returns
            per-position argmax (host picks position cur_len-1)."""
            logits = model.apply(
                params, enc, tokens,
                method=lambda m, e, t: m.text_decoder(e, t),
            )
            return jnp.argmax(logits, axis=-1)

        self._decode_step = _decode_step

        @jax.jit
        def _decode_logprobs(params, enc, tokens):
            """tokens [N, L] (enc broadcast over beams) → log-probs [N, L, V]."""
            mem = jnp.broadcast_to(enc, (tokens.shape[0],) + enc.shape[1:])
            logits = model.apply(
                params, mem, tokens,
                method=lambda m, e, t: m.text_decoder(e, t),
            )
            return jax.nn.log_softmax(logits, axis=-1)

        self._decode_logprobs = _decode_logprobs

        @jax.jit
        def _decode_logprobs_hmt(params, enc, tokens, read_lens):
            """tokens [N, L], read_lens [N] → log-probs [N, L, V] with the
            encoder memory masked to ``read_lens[i]`` frames per row —
            every (beam × candidate-read-position) scored in ONE program
            (the HMT generators' per-state decoder sweeps, batched)."""
            N = tokens.shape[0]
            mem = jnp.broadcast_to(enc, (N,) + enc.shape[1:])
            S = enc.shape[1]
            cross = (jnp.arange(S)[None, None, None, :]
                     < read_lens[:, None, None, None])
            logits = model.apply(
                params, mem, tokens, cross,
                method=lambda m, e, t, cm: m.text_decoder(e, t, cross_mask=cm),
            )
            return jax.nn.log_softmax(logits, axis=-1)

        self._decode_logprobs_hmt = _decode_logprobs_hmt

        @jax.jit
        def _decode_scores_hmt(params, enc, tokens, read_lens):
            """Like ``_decode_logprobs_hmt`` but additionally returns
            the learned transition head's write probabilities (reference
            HMT transition model, hmt_sim_sequence_generator.py:449-470)
            — one program for the joint (token, read) score AND the
            READ/WRITE gate."""
            N = tokens.shape[0]
            mem = jnp.broadcast_to(enc, (N,) + enc.shape[1:])
            S = enc.shape[1]
            cross = (jnp.arange(S)[None, None, None, :]
                     < read_lens[:, None, None, None])
            logits, write_logits = model.apply(
                params, mem, tokens, cross,
                method=lambda m, e, t, cm: m.decoder_scores(
                    e, t, cross_mask=cm),
            )
            return (jax.nn.log_softmax(logits, axis=-1),
                    jax.nn.sigmoid(write_logits))

        self._decode_scores_hmt = _decode_scores_hmt

        @jax.jit
        def _hmt_prefill(params, ckv, tokens, cache, read_lens):
            """Fill the self-K/V cache for the committed prefix under
            per-row read masks (the KV-cached HMT path's per-call
            prefill)."""
            ckv_b = _bcast_ckv(ckv, tokens.shape[0])
            S = ckv[0].shape[2]
            cross = (jnp.arange(S)[None, None, None, :]
                     < read_lens[:, None, None, None])
            _logits, cache = inc.prefill(
                params["params"]["text_decoder"], spec, ckv_b, tokens,
                cache, cross)
            return cache

        self._hmt_prefill = _hmt_prefill

        def _make_hmt_kv_step(learned: bool):
            @jax.jit
            def _step(params, ckv, cache, tokens, parents, read_lens):
                ckv_b = _bcast_ckv(ckv, tokens.shape[0])
                S = ckv[0].shape[2]
                cross = (jnp.arange(S)[None, None, None, :]
                         < read_lens[:, None, None, None])
                cache = inc.gather_beams(cache, parents)
                logits, cache, feats = inc.decode_step(
                    params["params"]["text_decoder"], spec, ckv_b, cache,
                    tokens, cross, return_features=True)
                lp = jax.nn.log_softmax(logits, axis=-1)
                if learned:
                    tp = params["params"]["transition_head"]
                    wl = feats @ tp["kernel"][:, 0] + tp["bias"][0]
                    return lp, jax.nn.sigmoid(wl), cache
                return lp, None, cache

            return _step

        self._hmt_kv_step_conf = _make_hmt_kv_step(False)
        self._hmt_kv_step_learned = _make_hmt_kv_step(True)

        # --- incremental (KV-cached) decoding programs ---
        mcfg = model.config
        self.decoder_spec = inc.DecoderSpec(
            num_layers=mcfg.decoder_layers,
            num_heads=mcfg.num_heads,
            hidden_dim=mcfg.hidden_dim,
            vocab_size=mcfg.vocab_size,
        )
        spec = self.decoder_spec

        @jax.jit
        def _cross_kv(params, enc):
            return inc.cross_kv(params["params"]["text_decoder"], spec, enc)

        self._cross_kv = _cross_kv

        @jax.jit
        def _prefill(params, ckv, tokens, cache):
            return inc.prefill(
                params["params"]["text_decoder"], spec, ckv, tokens, cache
            )

        self._prefill = _prefill

        @jax.jit
        def _decode_incr(params, ckv, cache, token):
            return inc.decode_step(
                params["params"]["text_decoder"], spec, ckv, cache, token
            )

        self._decode_incr = _decode_incr

        def _bcast_ckv(ckv, rows):
            return jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(
                    a, (a.shape[0], rows) + a.shape[2:]), ckv)

        @jax.jit
        def _prefill_lp(params, ckv, tokens, cache):
            ckv = _bcast_ckv(ckv, tokens.shape[0])
            logits, cache = inc.prefill(
                params["params"]["text_decoder"], spec, ckv, tokens, cache)
            return jax.nn.log_softmax(logits, axis=-1), cache

        self._prefill_lp = _prefill_lp

        @jax.jit
        def _beam_step(params, ckv, cache, tokens, parents):
            """Gather cache rows by beam parents, commit ``tokens``,
            return next-token log-probs — the KV-cached beam step
            (reference ``reorder_incremental_state`` +
            ``forward_decoder``, agent/sequence_generator.py:93-99)."""
            ckv = _bcast_ckv(ckv, tokens.shape[0])
            cache = inc.gather_beams(cache, parents)
            logits, cache = inc.decode_step(
                params["params"]["text_decoder"], spec, ckv, cache, tokens)
            return jax.nn.log_softmax(logits, axis=-1), cache

        self._beam_step = _beam_step

        if code_vocoder is not None:

            @jax.jit
            def _synth(code_params, units):
                return code_vocoder.apply(code_params, units)

            self._synth = _synth

    # ---- encoder over the current source prefix (bucketed) ----

    def encode_prefix(self, mel_frames: np.ndarray):
        """mel_frames [T, n_mels] → dict with prefix-sliced CTC streams."""
        T = mel_frames.shape[0]
        if T == 0:
            return None
        bucket = _bucket(T, self.chunk, self.cfg.source_buckets)
        mel = np.zeros((1, bucket, mel_frames.shape[1]), np.float32)
        mel[0, :T] = mel_frames
        enc, src_ids, tgt_ids, unit_ids = self._encode(self.params, jnp.asarray(mel))
        src_tokens, src_frames = ctc_greedy_collapse(
            np.asarray(src_ids)[0, :T], self.cfg.ctc_blank
        )
        tgt_tokens, tgt_frames = ctc_greedy_collapse(
            np.asarray(tgt_ids)[0, :T], self.cfg.ctc_blank
        )
        return {
            "enc": enc,
            "valid_frames": T,
            "src_tokens": src_tokens,
            "src_token_frames": src_frames,
            "tgt_tokens": tgt_tokens,
            "tgt_token_frames": tgt_frames,
            "unit_argmax": np.asarray(unit_ids)[0, : T * 8],  # 8x T2U upsampling
        }

    # ---- bounded greedy continuation of the text decoder ----

    def new_session(self) -> DecoderSession:
        """Fresh per-stream KV-cache state (one per streaming session)."""
        return DecoderSession(self)

    def continue_text(
        self,
        enc: Array,
        prefix_ids: List[int],
        max_new_tokens: Optional[int] = None,
        session: Optional[DecoderSession] = None,
    ) -> List[int]:
        """Greedy-decode up to ``max_new_tokens`` continuation tokens
        (reference ``generate_decoder(..., max_new_tokens)``,
        agent/sequence_generator.py:165-180).

        With a :class:`DecoderSession`, decoding is KV-cached: cross K/V
        are projected once for this call's encoder state, the session
        cache covers the prefix (pruned on retraction), and each new
        token costs ONE O(max_len) incremental program — per-token cost
        independent of prefix length.  Without a session it falls back
        to the full causal re-decode per token (kept for parity tests)."""
        cfg = self.cfg
        max_new = max_new_tokens or cfg.max_new_tokens
        seq = [cfg.bos_id] + list(prefix_ids)
        n = min(len(seq), cfg.max_target_len)
        new: List[int] = []

        if session is not None:
            ckv = self._cross_kv(self.params, enc)
            logits = session.sync(ckv, seq[:n])
            while max_new > 0:
                nxt = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
                new.append(nxt)
                if (nxt == cfg.eos_id or len(new) >= max_new
                        or len(session.tokens) >= cfg.max_target_len - 1):
                    break
                logits, session.cache = self._decode_incr(
                    self.params, ckv, session.cache,
                    jnp.asarray([nxt], jnp.int32),
                )
                session.tokens.append(nxt)
            return new

        tokens = np.zeros((1, cfg.max_target_len), np.int32)
        tokens[0, :n] = seq[:n]
        for _ in range(max_new):
            if n >= cfg.max_target_len:
                break
            preds = np.asarray(self._decode_step(self.params, enc, jnp.asarray(tokens)))
            nxt = int(preds[0, n - 1])
            if nxt == cfg.eos_id:
                new.append(nxt)
                break
            tokens[0, n] = nxt
            seq.append(nxt)
            new.append(nxt)
            n += 1
        return new

    def continue_text_beam(
        self,
        enc: Array,
        prefix_ids: List[int],
        *,
        beam_size: int = 5,
        max_new_tokens: Optional[int] = None,
        length_penalty: float = 1.0,
        kv_cached: bool = True,
    ) -> List[int]:
        """Beam-search continuation (reference HMT generators — see
        :mod:`hifigan_tpu.streaming.beam`).

        Default path is **KV-cached**: the seed prefix is prefilled once
        into a ``[beam, max_len]`` cache, then each beam step is one
        O(max_len) incremental program with the cache reordered by
        parent (``incremental.gather_beams``) — per-step cost
        independent of prefix length.  ``kv_cached=False`` keeps the
        full causal re-decode per step (parity reference)."""
        from hifigan_tpu.streaming import beam as beam_mod

        cfg = self.cfg
        max_new = max_new_tokens or cfg.max_new_tokens

        if kv_cached:
            seed = ([cfg.bos_id] + list(prefix_ids))[: cfg.max_target_len]
            n = len(seed)
            ckv = self._cross_kv(self.params, enc)
            cache = inc.init_cache(self.decoder_spec, beam_size,
                                   cfg.max_target_len)
            buf = np.zeros((beam_size, cfg.max_target_len), np.int32)
            buf[:, :n] = seed
            lp_all, cache = self._prefill_lp(self.params, ckv,
                                             jnp.asarray(buf), cache)
            cache = inc.with_index(cache, n)
            state = {"cache": cache}

            def step_fn(tokens: np.ndarray, parents: np.ndarray) -> np.ndarray:
                lp, state["cache"] = self._beam_step(
                    self.params, ckv, state["cache"],
                    jnp.asarray(tokens, jnp.int32),
                    jnp.asarray(parents, jnp.int32))
                return np.asarray(lp)

            hyps = beam_mod.kv_beam_search(
                np.asarray(lp_all[0, n - 1]), step_fn,
                seed_len=n, beam_size=beam_size, max_new_tokens=max_new,
                max_len=cfg.max_target_len, eos_id=cfg.eos_id,
                length_penalty=length_penalty)
            return hyps[0].tokens if hyps else []

        rows = beam_size + 1

        def score_fn(tokens: np.ndarray) -> np.ndarray:
            n = tokens.shape[0]
            padded = np.zeros((rows, tokens.shape[1]), np.int32)
            padded[:n] = tokens
            out = np.asarray(self._decode_logprobs(self.params, enc, jnp.asarray(padded)))
            return out[:n]

        hyps = beam_mod.beam_search(
            score_fn,
            prefix=prefix_ids,
            beam_size=beam_size,
            max_new_tokens=max_new,
            max_len=cfg.max_target_len,
            bos_id=cfg.bos_id,
            eos_id=cfg.eos_id,
            length_penalty=length_penalty,
        )
        return hyps[0].tokens if hyps else []

    def continue_text_hmt(
        self,
        enc: Array,
        prefix_ids: List[int],
        *,
        src_len: int,
        source_finished: bool,
        state=None,
        beam_size: int = 4,
        cands_per_token: int = 4,
        read_stride: Optional[int] = None,
        max_new_tokens: Optional[int] = None,
        write_threshold: float = 0.5,
        read_penalty: float = 0.1,
        transition: str = "confidence",
        kv_cached: bool = True,
    ):
        """HMT-class simultaneous beam continuation (reference
        ``hmt_sim_sequence_generator.py`` capability — see
        :func:`hifigan_tpu.streaming.beam.hmt_beam_search`).  ``src_len``
        is in encoder frames; reads advance by ``read_stride`` (default:
        one encoder chunk).  Returns the updated, resumable
        :class:`~hifigan_tpu.streaming.beam.HmtBeamState`.

        ``transition="learned"`` gates READ/WRITE with the trained
        transition head (requires a checkpoint trained with
        :mod:`hifigan_tpu.train.s2st_task`); ``"confidence"`` uses the
        max-token-probability heuristic.

        ``kv_cached=True`` (default): the committed prefix is prefilled
        once per policy call and each beam iteration is one O(max_len)
        incremental step over all (beam × read-candidate) rows — the
        fairseq incremental-state HMT behaviour (stale-prefix states
        under historical read positions) instead of re-decoding the
        full buffer per iteration."""
        from hifigan_tpu.streaming import beam as beam_mod

        cfg = self.cfg

        if kv_cached:
            stepper = _HmtKvStepper(
                self, enc, learned=(transition == "learned"),
                beam_rows=beam_size,
                step_rows=beam_size * cands_per_token)
            return beam_mod.hmt_beam_search(
                None,
                stepper=stepper,
                prefix=prefix_ids,
                src_len=src_len,
                source_finished=source_finished,
                state=state,
                beam_size=beam_size,
                cands_per_token=cands_per_token,
                read_stride=read_stride or self.chunk,
                max_new_tokens=max_new_tokens or cfg.max_new_tokens,
                max_len=cfg.max_target_len,
                bos_id=cfg.bos_id,
                eos_id=cfg.eos_id,
                write_threshold=write_threshold,
                read_penalty=read_penalty,
            )

        if transition == "learned":

            def score_fn(tokens: np.ndarray, read_lens: np.ndarray):
                lp, pw = self._decode_scores_hmt(
                    self.params, enc, jnp.asarray(tokens, jnp.int32),
                    jnp.asarray(read_lens, jnp.int32))
                return np.asarray(lp), np.asarray(pw)

        else:

            def score_fn(tokens: np.ndarray, read_lens: np.ndarray):
                return np.asarray(self._decode_logprobs_hmt(
                    self.params, enc, jnp.asarray(tokens, jnp.int32),
                    jnp.asarray(read_lens, jnp.int32),
                ))

        return beam_mod.hmt_beam_search(
            score_fn,
            prefix=prefix_ids,
            src_len=src_len,
            source_finished=source_finished,
            state=state,
            beam_size=beam_size,
            cands_per_token=cands_per_token,
            read_stride=read_stride or self.chunk,
            max_new_tokens=max_new_tokens or cfg.max_new_tokens,
            max_len=cfg.max_target_len,
            bos_id=cfg.bos_id,
            eos_id=cfg.eos_id,
            write_threshold=write_threshold,
            read_penalty=read_penalty,
        )

    # ---- units + waveform tail ----

    def units_from_prefix(self, unit_argmax: np.ndarray, emitted_units: int):
        """Unit CTC prefix continuation (reference ctc_generator.py:103-107),
        with pau reinsertion at long blank runs (source-time T2U frames
        carry the silence signature; the decoder-fed stream does not)."""
        new_units, total = ctc_prefix_frames(
            unit_argmax, emitted_units, self.cfg.ctc_blank,
            silence_gap=self.cfg.unit_silence_gap)
        return new_units, total

    def units_from_text(
        self, enc: Array, text_ids: List[int], emitted_units: int
    ):
        """Decoder-fed unit generation (reference agent wiring —
        mt_decoder features → T2U, agent.py:638-679): unit CTC argmax
        over the *committed text prefix*'s decoder features, with the
        same prefix-continuation semantics as the encoder-fed path.
        Emitted units therefore stay consistent with the emitted text."""
        if not text_ids:
            return [], emitted_units
        cfg = self.cfg
        if not hasattr(self, "_decoder_units"):

            @jax.jit
            def _decoder_units(params, enc, tokens):
                logits = self.model.apply(
                    params, enc, tokens,
                    method=lambda m, e, t: m.decoder_units(e, t))
                return jnp.argmax(logits, axis=-1)

            self._decoder_units = _decoder_units
        seq = ([cfg.bos_id] + list(text_ids))[: cfg.max_target_len]
        buf = np.zeros((1, cfg.max_target_len), np.int32)
        buf[0, : len(seq)] = seq
        unit_ids = np.asarray(self._decoder_units(self.params, enc,
                                                  jnp.asarray(buf)))
        valid = unit_ids[0, : len(seq) * 8]  # 8× T2U upsampling
        new_units, total = ctc_prefix_frames(valid, emitted_units,
                                             cfg.ctc_blank)
        return new_units, total

    def synthesize_tail(self, all_units: List[int], n_new_units: int) -> np.ndarray:
        """Vocode the full unit prefix, return only the new
        duration-aligned tail (reference ``dur[-len(cur_unit):].sum()·320``
        rule, agent.py:743-770)."""
        assert self.code_vocoder is not None, "no CodeVocoder attached"
        if not all_units or n_new_units == 0:
            return np.zeros(0, np.float32)
        U = len(all_units)
        u_bucket = _bucket(U, 8, (8, 16, 32, 64, 128, 256, 512))
        units = np.zeros((1, u_bucket), np.int32)
        units[0, :U] = all_units
        wav, dur, n_samples = self._synth(self.code_params, jnp.asarray(units))
        dur = np.asarray(dur)[0]
        total = int(np.asarray(n_samples)[0])
        ratio = 1
        for f in self.code_vocoder.config.upsample_factors:
            ratio *= f
        # padded bucket units have predicted durations too; only count real ones
        pad_samples = int(dur[U:u_bucket].sum()) * ratio
        total_real = total - pad_samples
        n_new = int(dur[U - n_new_units : U].sum()) * ratio
        wav = np.asarray(wav)[0, 0]
        return wav[max(0, total_real - n_new) : total_real]
