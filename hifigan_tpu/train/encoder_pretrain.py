"""Discriminative pre-training for the conditioning encoders.

The reference loads *pretrained* speaker/emotion encoders (SpeechBrain
ECAPA — ``/root/reference/speaker_embedding/ecapa_tdnn.py:100-114``;
wav2vec2-backed Emotion2Vec — ``/root/reference/emotion_embedding/
emotion2vec.py:90-135``) and its from-scratch encoders carry classifier
heads for supervised training (``/root/reference/embedding_extractors.py:94-98``
speaker classifier; ``:220-256`` 8-way emotion head).  This rig has no
network egress, so the encoders are trained here, on supervision the
formant corpus provides for free:

* **speaker identity** — 32 parameterised speakers
  (:class:`~hifigan_tpu.train.corpus.SpeakerProfile`), cross-entropy
  over the ECAPA classifier head;
* **arousal** — the corpus's emotion axis (reference framing:
  ``emotion2vec.py:42-45``), quantised into
  :data:`N_AROUSAL_BINS` classes for the Emotion2Vec head.

Without this, embedding-similarity metrics are vacuous: a random-init
encoder maps *everything* near the same point (round-2 EVAL: random
generator control already scored SIM 0.93).  Trained encoders make SIM
separation measurable and the voice-cloning transfer test meaningful.

TPU shape: both encoders train in ONE jitted step — crops are sampled
from an HBM-resident labelled bank inside the program
(:mod:`hifigan_tpu.train.device_data` pattern), mel is computed on
device, and both losses share the forward's mel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from hifigan_tpu.models.embeddings import EcapaTdnn, Emotion2Vec
from hifigan_tpu.ops.stft import MelConfig, log_mel_spectrogram
from hifigan_tpu.train.corpus import FormantSpeechCorpus

Array = jax.Array

N_AROUSAL_BINS = 8  # matches the reference's 8-way emotion head


def arousal_bin(arousal) -> np.ndarray:
    """Quantise arousal ∈ [0.2, 1.0] into N_AROUSAL_BINS classes."""
    a = (np.asarray(arousal) - 0.2) / 0.8
    return np.clip((a * N_AROUSAL_BINS).astype(np.int32), 0, N_AROUSAL_BINS - 1)


def build_labelled_bank(
    *,
    n_speakers: int = 32,
    utterances_per_speaker: int = 12,
    pad_to_multiple: int = 128,
    corpus: FormantSpeechCorpus | None = None,
    idx_offset: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Materialise a labelled corpus: returns ``(bank [N, L], lengths [N],
    speaker [N], arousal_bin [N])``.  ``idx_offset`` shifts utterance ids
    (held-out sets use a disjoint range)."""
    corpus = corpus or FormantSpeechCorpus(n_speakers=n_speakers)
    utts, spks, bins = [], [], []
    for s in range(n_speakers):
        for i in range(utterances_per_speaker):
            audio, _plan, arousal = corpus.utterance(
                s, idx_offset + i, return_plan=True)
            utts.append(audio)
            spks.append(s)
            bins.append(int(arousal_bin(arousal)))
    lengths = np.array([len(u) for u in utts], np.int32)
    L = -(-int(lengths.max()) // pad_to_multiple) * pad_to_multiple
    bank = np.zeros((len(utts), L), np.float32)
    for i, u in enumerate(utts):
        bank[i, : len(u)] = u
    return bank, lengths, np.array(spks, np.int32), np.array(bins, np.int32)


@dataclass(frozen=True)
class EncoderTrainConfig:
    n_speakers: int = 32
    segment_samples: int = 16_384  # 1 s — enough context for identity
    batch_size: int = 32
    learning_rate: float = 1e-3
    mel: MelConfig = MelConfig()
    ecapa_channels: int = 512
    # The *judge* Emotion2Vec trains at 3 layers / 256 dim: at the
    # reference's 6×512 (the :class:`Emotion2Vec` class default, kept
    # for the vocoder-internal extractor) the post-norm stack cannot
    # learn the arousal task at ANY probed lr (1e-3 and 1e-4 both pin
    # at ln(8) — measured on the real corpus task; a 3×256 stack on the
    # same data reaches >0.8 train accuracy in 300 steps).  The
    # reference never trains its 6×512 Emotion2Vec either — it ships
    # dummy/random embeddings when the pretrained backbone is absent
    # (/root/reference/hifigan_modified/conditioned_hifigan.py:111-147).
    emo_hidden: int = 256
    emo_layers: int = 3
    emo_heads: int = 4
    # AAM-softmax (ArcFace-style additive angular margin) for the
    # speaker objective: plain CE separates classes but leaves
    # same-speaker cosines well below the reference's 0.7 verification
    # threshold (/root/reference/speaker_embedding/ecapa_tdnn.py:212-225);
    # the margin pulls intra-class cosine toward 1 so the threshold is
    # meaningful.  SpeechBrain's pretrained ECAPA (which the reference
    # loads) is trained the same way.
    aam_margin: float = 0.2
    aam_scale: float = 30.0
    # The Emotion2Vec branch is a 6-layer *post-norm* transformer: at
    # the ECAPA branch's Adam lr of 1e-3 it never escapes the collapsed
    # basin (measured: cannot even memorise 16 fixed random-label mels —
    # loss pins at ~1.8; at 1e-4 the same probe memorises cleanly), so
    # the 8-way arousal head sat at chance for 64k steps.  The emotion
    # branch therefore gets its own schedule: linear warmup to a 10×
    # lower peak.
    emo_learning_rate: float = 1e-4
    emo_warmup_steps: int = 500
    # Same-speaker pairwise cosine pull: AAM alone separates classes
    # (cross-speaker cosine ~0.005 at margin 0.4) but leaves intra-class
    # cosine capped ~0.54 by content variance between clips — below the
    # reference's absolute 0.7 verification threshold
    # (/root/reference/speaker_embedding/ecapa_tdnn.py:212-225).  Each
    # step also embeds a second, different utterance of the same speaker
    # and pulls the pair's cosine toward 1.
    spk_pair_weight: float = 0.0


class EncoderTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    ecapa_params: Any
    emo_params: Any
    ecapa_opt: Any
    emo_opt: Any


def build_models(cfg: EncoderTrainConfig, dtype=jnp.float32):
    ecapa = EcapaTdnn(channels=cfg.ecapa_channels,
                      num_speakers=cfg.n_speakers, dtype=dtype)
    emo = Emotion2Vec(hidden_dim=cfg.emo_hidden, num_layers=cfg.emo_layers,
                      num_heads=cfg.emo_heads, num_emotions=N_AROUSAL_BINS,
                      dtype=dtype)
    return ecapa, emo


def emo_optimizer(cfg: EncoderTrainConfig) -> optax.GradientTransformation:
    """Warmup-then-constant Adam for the post-norm Emotion2Vec branch
    (see :class:`EncoderTrainConfig.emo_learning_rate`)."""
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.emo_learning_rate,
                               cfg.emo_warmup_steps),
         optax.constant_schedule(cfg.emo_learning_rate)],
        [cfg.emo_warmup_steps])
    return optax.adam(sched)


def create_encoder_state(
    rng: jax.Array, cfg: EncoderTrainConfig, dtype=jnp.float32
) -> Tuple[EncoderTrainState, EcapaTdnn, Emotion2Vec, optax.GradientTransformation]:
    ecapa, emo = build_models(cfg, dtype)
    frames = cfg.segment_samples // cfg.mel.hop_length
    tx = optax.adam(cfg.learning_rate)
    tx_emo = emo_optimizer(cfg)
    r1, r2 = jax.random.split(rng)

    @jax.jit
    def _init(r1, r2):
        mel = jnp.zeros((2, cfg.mel.n_mels, frames))
        ep = ecapa.init(r1, mel, train=True)
        mp = emo.init(r2, mel, train=True)
        return EncoderTrainState(
            step=jnp.zeros((), jnp.int32),
            ecapa_params=ep, emo_params=mp,
            ecapa_opt=tx.init(ep), emo_opt=tx_emo.init(mp),
        )

    return _init(r1, r2), ecapa, emo, tx


def make_encoder_train_step(
    ecapa: EcapaTdnn,
    emo: Emotion2Vec,
    cfg: EncoderTrainConfig,
    tx: optax.GradientTransformation,
    bank: Array,
    lengths: Array,
    speakers: Array,
    arousal_bins: Array,
) -> Callable[[EncoderTrainState, Array], Tuple[EncoderTrainState, dict]]:
    """One jitted step: sample crops on device, mel on device, CE losses
    for both encoders, two optimizer updates.

    The audio bank is threaded through the returned step as a *runtime
    argument* (``step(state, key, bank=...)``, default: the bank given
    here) rather than captured by the jit closure: closed-over device
    arrays are embedded in the lowered HLO, and this rig's relay rejects
    remote-compile bodies past a few hundred MB with HTTP 413
    (docs/ROUND_NOTES.md round-3 additions) — a 1 024-utterance bank is
    ~300 MB."""
    n = bank.shape[0]
    seg = cfg.segment_samples
    default_bank = bank
    del bank
    tx_emo = emo_optimizer(cfg)  # emotion branch: own (lower-lr) schedule

    def audio_to_mel(audio):
        mel = log_mel_spectrogram(audio, cfg.mel)  # [B, frames, n_mels]
        frames = seg // cfg.mel.hop_length
        return jnp.transpose(mel[:, :frames, :], (0, 2, 1))

    def crop_at(bank, utt, key):
        span = jnp.maximum(lengths[utt] - seg, 1)
        off = (jax.random.uniform(key, (cfg.batch_size,)) * span).astype(jnp.int32)
        return jax.vmap(
            lambda u, o: jax.lax.dynamic_slice(bank[u], (o,), (seg,))
        )(utt, off)

    def sample(key, bank):
        k_utt, k_off, k_p1, k_p2 = jax.random.split(key, 4)
        utt = jax.random.randint(k_utt, (cfg.batch_size,), 0, n)
        crops = crop_at(bank, utt, k_off)
        pair = None
        if cfg.spk_pair_weight > 0:
            # a *different* utterance of the same speaker (bank layout is
            # speaker-major — build_labelled_bank)
            u_per = n // cfg.n_speakers
            base = (utt // u_per) * u_per
            shift = jax.random.randint(k_p1, (cfg.batch_size,), 1, u_per)
            utt2 = base + (utt - base + shift) % u_per
            pair = crop_at(bank, utt2, k_p2)
        return crops, pair, speakers[utt], arousal_bins[utt]

    def step(state: EncoderTrainState, key: Array, bank: Array | None = None):
        crops, pair, spk_y, emo_y = sample(
            key, default_bank if bank is None else bank)
        mel = audio_to_mel(crops)
        pair_mel = audio_to_mel(pair) if pair is not None else None

        def ecapa_loss(params):
            emb = ecapa.apply(params, mel, train=False)  # L2-normalised
            # AAM-softmax over the classifier kernel's normalised columns
            w = params["params"]["classifier"]["kernel"]  # [192, S]
            w = w / jnp.linalg.norm(w, axis=0, keepdims=True).clip(1e-9)
            cos = (emb @ w).astype(jnp.float32)  # [B, S] cosine logits
            onehot = jax.nn.one_hot(spk_y, cos.shape[-1])
            logits = cfg.aam_scale * (cos - cfg.aam_margin * onehot)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, spk_y).mean()
            acc = jnp.mean((jnp.argmax(cos, -1) == spk_y).astype(jnp.float32))
            pair_cos = jnp.zeros(())
            if pair_mel is not None:
                emb2 = ecapa.apply(params, pair_mel, train=False)
                pair_cos = jnp.sum(
                    emb.astype(jnp.float32) * emb2.astype(jnp.float32),
                    axis=-1).mean()
                loss = loss + cfg.spk_pair_weight * (1.0 - pair_cos)
            return loss, (acc, pair_cos)

        def emo_loss(params):
            _utt, logits = emo.apply(params, mel, train=True)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, emo_y).mean()
            pred = jnp.argmax(logits, -1)
            acc = jnp.mean((pred == emo_y).astype(jnp.float32))
            # adjacent-bin tolerance: the 8 bins quantise a continuum, so
            # boundary-straddling crops make exact-bin accuracy a floor
            near = jnp.mean((jnp.abs(pred - emo_y) <= 1).astype(jnp.float32))
            return loss, (acc, near)

        (sl, (sa, spc)), sg = jax.value_and_grad(ecapa_loss, has_aux=True)(state.ecapa_params)
        (el, (ea, en)), eg = jax.value_and_grad(emo_loss, has_aux=True)(state.emo_params)
        su, so = tx.update(sg, state.ecapa_opt, state.ecapa_params)
        eu, eo = tx_emo.update(eg, state.emo_opt, state.emo_params)
        new_state = state.replace(
            step=state.step + 1,
            ecapa_params=optax.apply_updates(state.ecapa_params, su),
            emo_params=optax.apply_updates(state.emo_params, eu),
            ecapa_opt=so, emo_opt=eo,
        )
        metrics = {"speaker_loss": sl, "speaker_acc": sa,
                   "speaker_pair_cos": spc,
                   "emotion_loss": el, "emotion_acc": ea,
                   "emotion_acc_near": en}
        return new_state, metrics

    return step


def make_fused_encoder_step(step_fn, multi_steps: int = 1):
    """Fuse ``multi_steps`` optimizer steps into one scanned device
    program (dispatch amortisation; same rationale as the GAN step's
    scan fusion in :mod:`hifigan_tpu.train.train_step`).

    The fused callable accepts an optional trailing ``bank`` argument
    and threads it into every step — pass the device-resident bank here
    so it stays a buffer parameter instead of an HLO constant (HTTP 413
    remote-compile limit; see :func:`make_encoder_train_step`)."""
    if multi_steps <= 1:
        return jax.jit(step_fn, donate_argnums=(0,))

    def multi(state, keys, bank=None):
        state, ms = jax.lax.scan(lambda s, k: step_fn(s, k, bank),
                                 state, keys, length=multi_steps)
        return state, jax.tree_util.tree_map(jnp.mean, ms)

    return jax.jit(multi, donate_argnums=(0,))


def strip_classifier(params: Any) -> Any:
    """Drop the classifier head so the tree matches the facade's
    inference-mode extractor (the head only exists under ``train=True``)."""
    p = dict(params["params"])
    p.pop("classifier", None)
    return {"params": p}


def graft_into_extractor(gen_params: Any, ecapa_params: Any, emo_params: Any) -> Any:
    """Replace the vocoder facade's ``embedding_extractor`` subtrees
    (``ecapa`` / ``emotion2vec``) with trained encoder params.  Returns a
    new gen_params tree (input untouched).

    The encoder checkpoint's dims must match the facade's extractor
    (``TrainConfig.emo_hidden``/``emo_layers``/…).  NB the *judge*
    default (:class:`EncoderTrainConfig`) is now a 3×256 Emotion2Vec —
    grafting a judge checkpoint into a facade built at the class-default
    6×512 requires constructing the facade with matching dims."""
    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, gen_params))
    ext = out["params"]["embedding_extractor"]
    ext["ecapa"] = strip_classifier(ecapa_params)["params"]
    ext["emotion2vec"] = strip_classifier(emo_params)["params"]
    return out
