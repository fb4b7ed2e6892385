"""Self-contained paired training task for the StreamSpeech S2ST stack.

The reference ships a StreamSpeech model whose ``forward`` returns
training logits (``/root/reference/streamspeech_integration.py:322-375``)
but no trainer, no data, and no trained weights — every streaming demo
runs on random init.  This module closes that gap offline: the formant
corpus knows its own phone plan (free aligned transcripts), and a
deterministic toy translation defines a target language, so the full
multitask objective becomes trainable end-to-end:

* **source CTC** — phone transcript of the source speech (ASR head);
* **target CTC** — translated token sequence (the policy signal);
* **decoder CE** — teacher-forced simultaneous text decoder, with
  random source-*prefix* cross-attention masking so the decoder is
  robust to partial source (the simultaneous regime it runs in);
* **unit CTC** — translated units over the 8× T2U upsampling.

The toy translation ("formantese → reverse-formantese") is
content-bearing and non-monotonic at the word level: within each
pause-delimited word the phone sequence is *reversed* and mapped
through a fixed phone permutation.  Getting it right requires real
acoustic recognition plus word-boundary reordering — trivially
checkable, impossible to fake.

Token space: ``0`` = CTC blank / pad, ``1`` = BOS, ``2`` = EOS,
``3 + (phone_id - 1)`` = phone tokens (pau never surfaces as a token).
Unit space: ``0`` = blank/pad, ``1 + perm(phone)-1`` = unit ids.

TPU shape: audio lives in HBM, fbank extraction (matching the streaming
:class:`~hifigan_tpu.streaming.features.OnlineFbank` — 25 ms window /
10 ms shift, utterance CMVN) + batch gather + all four losses run in one
jitted program with static shapes; CTC uses ``optax.ctc_loss`` with
padding masks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from hifigan_tpu.models.streamspeech import StreamSpeechConfig, StreamSpeechS2ST
from hifigan_tpu.ops.stft import _hann, mel_filterbank
from hifigan_tpu.train.corpus import PHONES, FormantSpeechCorpus, plan_phone_ids

Array = jax.Array

BLANK = 0
BOS = 1
EOS = 2
TOKEN_OFFSET = 3
N_PHONES = len(PHONES)  # includes pau at id 0


def phone_permutation(seed: int = 1234) -> np.ndarray:
    """Fixed permutation over non-pau phone ids 1..N-1 (index 0 unused)."""
    rng = np.random.default_rng(seed)
    perm = np.zeros(N_PHONES, np.int32)
    perm[1:] = rng.permutation(np.arange(1, N_PHONES))
    return perm


_PERM = phone_permutation()


def source_tokens(phone_ids: np.ndarray) -> np.ndarray:
    """ASR transcript: non-pau phones → token ids."""
    p = phone_ids[phone_ids != 0]
    return (TOKEN_OFFSET + p - 1).astype(np.int32)


def translate(phone_ids: np.ndarray) -> np.ndarray:
    """Toy translation: per pause-delimited word, reverse the phone
    order and map through the fixed permutation."""
    out: list[int] = []
    word: list[int] = []
    for p in phone_ids:
        if p == 0:
            out.extend(TOKEN_OFFSET + _PERM[q] - 1 for q in reversed(word))
            word = []
        else:
            word.append(int(p))
    out.extend(TOKEN_OFFSET + _PERM[q] - 1 for q in reversed(word))
    return np.array(out, np.int32)


def target_units(phone_ids: np.ndarray) -> np.ndarray:
    """Unit sequence: translated phones in unit space (1-based)."""
    toks = translate(phone_ids)
    return (toks - TOKEN_OFFSET + 1).astype(np.int32)


def small_config(vocab_size: int = 32, unit_vocab: int = 32) -> StreamSpeechConfig:
    """Compact trainable profile (architecture identical, smaller dims)."""
    return StreamSpeechConfig(
        hidden_dim=256, encoder_layers=6, decoder_layers=3, num_heads=4,
        vocab_size=vocab_size, unit_vocab_size=unit_vocab, chunk_size=8,
        vocoder_hidden=128, vocoder_upsample=(8, 8, 2, 2),
        ecapa_channels=64, emo_hidden=64, emo_layers=1,
    )


@dataclass(frozen=True)
class S2STTaskConfig:
    n_utterances: int = 512
    n_speakers: int = 32
    max_seconds: float = 4.0
    max_src_tokens: int = 56
    max_tgt_tokens: int = 56
    batch_size: int = 16
    learning_rate: float = 3e-4
    warmup_steps: int = 500
    prefix_mask_prob: float = 0.5
    # lower bound of the sampled source-prefix fraction on masked rows —
    # short prefixes are where the decoder is genuinely uncertain, which
    # both hardens streaming decode and gives the transition head
    # non-constant labels
    prefix_min_frac: float = 0.25
    # fbank (streaming parity: 25 ms window / 10 ms shift)
    sample_rate: int = 16_000
    hop: int = 160
    win: int = 400

    @property
    def n_frames(self) -> int:
        return int(self.max_seconds * self.sample_rate) // self.hop

    @property
    def n_samples(self) -> int:
        return (self.n_frames - 1) * self.hop + self.win


def build_s2st_bank(cfg: S2STTaskConfig, *, idx_offset: int = 0) -> dict:
    """Render the paired dataset into fixed-shape numpy arrays.

    Utterances longer than ``max_seconds`` or with over-long token
    sequences are re-drawn (next idx) so every row fits the static
    shapes.  Returns arrays: audio [N, S], n_frames [N],
    src/src_pad [N, Ls], tgt/tgt_pad [N, Lt], dec_in/dec_out/dec_pad
    [N, Lt+1], units/units_pad [N, Lt], speaker [N]."""
    corpus = FormantSpeechCorpus(n_speakers=cfg.n_speakers)
    N = cfg.n_utterances
    audio = np.zeros((N, cfg.n_samples), np.float32)
    n_frames = np.zeros(N, np.int32)
    Ls, Lt = cfg.max_src_tokens, cfg.max_tgt_tokens
    src = np.zeros((N, Ls), np.int32)
    src_pad = np.ones((N, Ls), np.float32)
    tgt = np.zeros((N, Lt), np.int32)
    tgt_pad = np.ones((N, Lt), np.float32)
    dec_in = np.zeros((N, Lt + 1), np.int32)
    dec_out = np.zeros((N, Lt + 1), np.int32)
    dec_pad = np.ones((N, Lt + 1), np.float32)
    units = np.zeros((N, Lt), np.int32)
    units_pad = np.ones((N, Lt), np.float32)
    speaker = np.zeros(N, np.int32)

    i = 0
    draw = 0
    while i < N:
        spk = i % cfg.n_speakers
        wav, plan, _ar = corpus.utterance(
            spk, idx_offset + draw, return_plan=True)
        draw += 1
        ids = plan_phone_ids(plan)
        s_toks = source_tokens(ids)
        t_toks = translate(ids)
        if (len(wav) > cfg.n_samples or len(s_toks) > Ls
                or len(t_toks) > Lt or len(s_toks) == 0):
            continue
        audio[i, : len(wav)] = wav
        n_frames[i] = max(1, min((len(wav) - cfg.win) // cfg.hop + 1,
                                 cfg.n_frames))
        src[i, : len(s_toks)] = s_toks
        src_pad[i, : len(s_toks)] = 0.0
        tgt[i, : len(t_toks)] = t_toks
        tgt_pad[i, : len(t_toks)] = 0.0
        dec_in[i, 0] = BOS
        dec_in[i, 1 : len(t_toks) + 1] = t_toks
        dec_out[i, : len(t_toks)] = t_toks
        dec_out[i, len(t_toks)] = EOS
        dec_pad[i, : len(t_toks) + 1] = 0.0
        u = target_units(ids)
        units[i, : len(u)] = u
        units_pad[i, : len(u)] = 0.0
        speaker[i] = spk
        i += 1
    return dict(audio=audio, n_frames=n_frames, src=src, src_pad=src_pad,
                tgt=tgt, tgt_pad=tgt_pad, dec_in=dec_in, dec_out=dec_out,
                dec_pad=dec_pad, units=units, units_pad=units_pad,
                speaker=speaker)


def batched_fbank(audio: Array, n_frames_total: int, hop: int, win: int,
                  n_mels: int = 80, sample_rate: int = 16_000,
                  valid_frames: Array | None = None) -> Array:
    """``[B, S] → [B, T, n_mels]`` log-fbank with per-utterance CMVN over
    the valid frames (parity with the streaming extractor's utterance
    CMVN — :mod:`hifigan_tpu.streaming.features`)."""
    idx = np.arange(n_frames_total)[:, None] * hop + np.arange(win)[None, :]
    frames = audio[:, idx] * jnp.asarray(_hann(win))
    n_fft = int(2 ** np.ceil(np.log2(win)))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, 20.0,
                                    sample_rate / 2))
    mel = jnp.log(jnp.maximum(power @ fb, 1e-10))
    if valid_frames is None:
        mean = mel.mean(axis=1, keepdims=True)
        std = mel.std(axis=1, keepdims=True)
        return (mel - mean) / jnp.maximum(std, 1e-5)
    mask = (jnp.arange(n_frames_total)[None, :] < valid_frames[:, None])
    m = mask[..., None].astype(mel.dtype)
    denom = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    mean = (mel * m).sum(axis=1, keepdims=True) / denom
    var = (jnp.square(mel - mean) * m).sum(axis=1, keepdims=True) / denom
    mel = (mel - mean) / jnp.maximum(jnp.sqrt(var), 1e-5)
    return mel * m


class S2STTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def create_s2st_state(
    rng: jax.Array,
    model_cfg: StreamSpeechConfig,
    task_cfg: S2STTaskConfig,
    dtype=jnp.float32,
) -> Tuple[S2STTrainState, StreamSpeechS2ST, optax.GradientTransformation]:
    model = StreamSpeechS2ST(model_cfg, dtype=dtype)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, task_cfg.learning_rate, task_cfg.warmup_steps, 200_000,
        task_cfg.learning_rate * 0.05)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(schedule))

    @jax.jit
    def _init(rng):
        feats = jnp.zeros((2, 64, model_cfg.input_dim))
        dec = jnp.zeros((2, 8), jnp.int32)
        # decoder_units_out=True so the decoder-fed T2U path and the
        # learned transition head exist in the parameter tree
        params = model.init(rng, feats, dec, chunked=True, run_vocoder=False,
                            decoder_units_out=True)
        return S2STTrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=tx.init(params))

    return _init(rng), model, tx


def make_s2st_train_step(
    model: StreamSpeechS2ST,
    tx: optax.GradientTransformation,
    task_cfg: S2STTaskConfig,
    bank: dict,  # device-resident arrays from build_s2st_bank
    *,
    multi_steps: int = 1,
) -> Callable[[S2STTrainState, Array], Tuple[S2STTrainState, dict]]:
    """One jitted program: gather batch from HBM bank, fbank + CMVN,
    forward, all four losses, optimizer update.

    The bank is threaded through the returned step as a runtime argument
    (``step(state, key, bank=...)``; default: the dict given here).
    Closed-over device arrays are baked into the lowered HLO and this
    rig's relay rejects remote-compile bodies past a few hundred MB with
    HTTP 413 (docs/ROUND_NOTES.md) — a 2 048-utterance bank is ~520 MB."""
    N = bank["n_frames"].shape[0]
    B = task_cfg.batch_size
    T = task_cfg.n_frames
    default_bank = bank
    del bank

    def step(state: S2STTrainState, key: Array, bank: dict | None = None):
        if bank is None:
            bank = default_bank
        k_idx, k_pref, k_cut = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (B,), 0, N)
        audio = bank["audio"][idx]
        nf = bank["n_frames"][idx]
        feats = batched_fbank(audio, T, task_cfg.hop, task_cfg.win,
                              valid_frames=nf)
        logit_pad = (jnp.arange(T)[None, :] >= nf[:, None]).astype(jnp.float32)
        dec_in = bank["dec_in"][idx]
        dec_out = bank["dec_out"][idx]
        dec_pad = bank["dec_pad"][idx]

        # simultaneous-robust training: for a random half of the batch,
        # restrict decoder cross-attention to a random source prefix
        use_prefix = jax.random.bernoulli(
            k_pref, task_cfg.prefix_mask_prob, (B,))
        frac = jax.random.uniform(k_cut, (B,),
                                  minval=task_cfg.prefix_min_frac,
                                  maxval=1.0)
        cutoff = jnp.where(use_prefix,
                           jnp.maximum((frac * nf).astype(jnp.int32), 1),
                           T)
        cross_mask = (jnp.arange(T)[None, None, None, :]
                      < cutoff[:, None, None, None])

        def loss_fn(params):
            out = model.apply(params, feats, dec_in, chunked=True,
                              cross_mask=cross_mask, run_vocoder=False,
                              decoder_units_out=True)
            l_src = optax.ctc_loss(
                out["source_ctc_logits"], logit_pad,
                bank["src"][idx], bank["src_pad"][idx]).mean()
            l_tgt = optax.ctc_loss(
                out["target_ctc_logits"], logit_pad,
                bank["tgt"][idx], bank["tgt_pad"][idx]).mean()
            unit_logits = out["unit_logits"]
            up = unit_logits.shape[1] // T  # 8× T2U upsampling
            unit_pad = jnp.repeat(logit_pad, up, axis=1)
            l_unit = optax.ctc_loss(
                unit_logits, unit_pad,
                bank["units"][idx], bank["units_pad"][idx]).mean()
            logp = jax.nn.log_softmax(out["text_logits"], axis=-1)
            nll = -jnp.take_along_axis(
                logp, dec_out[..., None], axis=-1)[..., 0]
            keep = 1.0 - dec_pad
            l_dec = (nll * keep).sum() / jnp.maximum(keep.sum(), 1.0)
            acc = ((jnp.argmax(logp, -1) == dec_out) * keep).sum() / \
                jnp.maximum(keep.sum(), 1.0)
            # decoder-fed T2U (the reference agent's unit wiring,
            # agent.py:638-679): unit CTC over the teacher-forced
            # decoder features — trains the shared T2U to produce units
            # consistent with the emitted text
            du_logits = out["decoder_unit_logits"]
            du_pad = jnp.repeat(dec_pad, du_logits.shape[1] // dec_pad.shape[1],
                                axis=1)
            l_unit_dec = optax.ctc_loss(
                du_logits, du_pad,
                bank["units"][idx], bank["units_pad"][idx]).mean()
            # learned READ/WRITE transition head (reference HMT
            # transition model, hmt_sim_sequence_generator.py:449-470):
            # self-supervised label — is the decoder already right under
            # this read prefix?  Under teacher forcing the label is ~98%
            # positive, so a plain BCE collapses to "always WRITE"
            # (round-3 degenerate head: transition_acc ≡ dec_acc).  Two
            # counter-measures: (a) the label is only scored on
            # prefix-masked rows, where the decoder is genuinely wrong
            # sometimes; (b) the BCE is class-balanced — positives and
            # negatives each carry half the total weight — so the prior
            # cannot be the minimiser.
            correct = (jnp.argmax(logp, -1) == dec_out).astype(jnp.float32)
            correct = jax.lax.stop_gradient(correct)
            wl = out["write_logits"]
            tkeep = keep * use_prefix[:, None].astype(jnp.float32)
            pos = (correct * tkeep).sum()
            neg = ((1.0 - correct) * tkeep).sum()
            w = jnp.where(correct > 0.5,
                          0.5 / jnp.maximum(pos, 1.0),
                          0.5 / jnp.maximum(neg, 1.0)) * tkeep
            l_trans = (optax.sigmoid_binary_cross_entropy(wl, correct)
                       * w).sum()
            pred_w = (wl > 0).astype(jnp.float32)
            tpr = (pred_w * correct * tkeep).sum() / jnp.maximum(pos, 1.0)
            tnr = ((1.0 - pred_w) * (1.0 - correct) * tkeep).sum() / \
                jnp.maximum(neg, 1.0)
            # balanced accuracy: 0.5 for any constant head, regardless
            # of the label prior — degeneracy is visible, not hidden
            trans_acc = 0.5 * (tpr + tnr)
            # decoder-fed unit CTC down-weighted: it only converges once
            # the decoder features stabilise, and at weight 0.5 its early
            # plateau dominated the total gradient
            total = (l_src + l_tgt + l_dec + 0.5 * l_unit + 0.2 * l_unit_dec
                     + 0.2 * l_trans)
            return total, {"src_ctc": l_src, "tgt_ctc": l_tgt,
                           "dec_ce": l_dec, "unit_ctc": l_unit,
                           "unit_dec_ctc": l_unit_dec,
                           "transition_bce": l_trans,
                           "transition_acc": trans_acc, "dec_acc": acc}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state),
                {"loss": loss, **aux})

    if multi_steps > 1:

        def multi(state, keys, bank=None):
            state, ms = jax.lax.scan(lambda s, k: step(s, k, bank),
                                     state, keys, length=multi_steps)
            return state, jax.tree_util.tree_map(jnp.mean, ms)

        return jax.jit(multi, donate_argnums=(0,))

    return jax.jit(step, donate_argnums=(0,))


def make_greedy_translate(
    model: StreamSpeechS2ST, task_cfg: S2STTaskConfig, max_len: int = 56
) -> Callable[[Any, Array, Array], Array]:
    """Jitted offline greedy decode: encode once, then a ``fori_loop``
    fills the token buffer autoregressively through the text decoder.
    Returns ``tokens [B, max_len]`` (EOS-terminated, 0-padded)."""

    def run(params, audio: Array, n_frames: Array) -> Array:
        T = task_cfg.n_frames
        feats = batched_fbank(audio, T, task_cfg.hop, task_cfg.win,
                              valid_frames=n_frames)
        enc = model.apply(params, feats,
                          method=lambda m, f: m.encoder(f, chunked=True))
        B = audio.shape[0]
        dec = jnp.zeros((B, max_len + 1), jnp.int32).at[:, 0].set(BOS)

        def body(t, dec):
            logits = model.apply(
                params, enc, dec,
                method=lambda m, e, d: m.text_decoder(e, d))
            nxt = jnp.argmax(logits[:, t], axis=-1).astype(jnp.int32)
            return dec.at[:, t + 1].set(nxt)

        dec = jax.lax.fori_loop(0, max_len, body, dec)
        toks = dec[:, 1:]
        # zero everything from the first EOS on
        is_eos = jnp.cumsum((toks == EOS).astype(jnp.int32), axis=1) > 0
        return jnp.where(is_eos, 0, toks)

    return jax.jit(run)


def evaluate_token_f1(
    model: StreamSpeechS2ST,
    params: Any,
    task_cfg: S2STTaskConfig,
    bank: dict,
    *,
    batch_size: int = 8,
) -> dict:
    """Greedy-decode a held-out bank and report mean token F1 + exact
    sequence accuracy (the 'nontrivially accurate text' evidence)."""
    run = make_greedy_translate(model, task_cfg, max_len=bank["tgt"].shape[1])
    N = bank["audio"].shape[0]
    f1s, exact = [], 0
    for i in range(0, N - N % batch_size, batch_size):
        sl = slice(i, i + batch_size)
        toks = np.asarray(run(params, jnp.asarray(bank["audio"][sl]),
                              jnp.asarray(bank["n_frames"][sl])))
        for b in range(toks.shape[0]):
            ref = bank["tgt"][i + b]
            ref = ref[bank["tgt_pad"][i + b] == 0]
            hyp = toks[b][toks[b] != 0]
            f1s.append(token_f1(hyp, ref))
            exact += int(len(hyp) == len(ref) and (hyp == ref).all())
    n = len(f1s)
    return {"token_f1": float(np.mean(f1s)) if f1s else 0.0,
            "exact_match": exact / max(n, 1), "n": n}


def token_f1(hyp: np.ndarray | list, ref: np.ndarray | list) -> float:
    """Bag-of-tokens F1 (the 'nontrivially accurate text' metric)."""
    from collections import Counter

    h, r = Counter(list(map(int, hyp))), Counter(list(map(int, ref)))
    overlap = sum((h & r).values())
    if overlap == 0:
        return 0.0
    prec = overlap / max(sum(h.values()), 1)
    rec = overlap / max(sum(r.values()), 1)
    return 2 * prec * rec / (prec + rec)
