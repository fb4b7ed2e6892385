"""Unit-vocoder (CodeHiFiGAN) GAN training on the translated corpus.

The reference loads a *pretrained* CodeHiFiGAN checkpoint for its S2ST
agents (``/root/reference/agent/tts/vocoder.py:36-45``) — no trainer
exists, and offline this framework previously ran the unit vocoder on
random weights (noise audio).  This module trains it:

* the toy translation (:mod:`hifigan_tpu.train.s2st_task`) maps a
  source phone plan to a translated plan, and the formant corpus
  *renders* that plan as real speech
  (:meth:`~hifigan_tpu.train.corpus.FormantSpeechCorpus.render_plan`),
  giving ground-truth (units, durations, waveform) triples;
* units are translated phone ids (pau = 0 is the silence unit; CTC
  never emits it, the vocoder still learns it for inter-word gaps);
* durations come from cumulative frame rounding at the vocoder's
  16 ms frame rate, so unit boundaries drift < 1 frame from the audio;
* training expands with TEACHER durations while the VariancePredictor
  is supervised on log-durations (fairseq recipe — the predictor takes
  over at inference, ``codehifigan.py:59-66``);
* GAN losses mirror the main vocoder trainer (LSGAN + deep feature
  matching + mel L1, ``complete_vocoder.py:89-184`` weights), windowed
  over fixed unit spans with validity masks for static shapes.

With this trained, ``cli simulate --agent s2st`` produces intelligible
translated *speech*, and ASR-BLEU can run offline end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hifigan_tpu.models.code_vocoder import CodeVocoder, CodeVocoderConfig
from hifigan_tpu.models.discriminators import Discriminators
from hifigan_tpu.train.corpus import (
    PHONE_TO_ID,
    PHONES,
    FormantSpeechCorpus,
)
from hifigan_tpu.train.losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    mel_l1_loss,
)
from hifigan_tpu.train.state import GanTrainState, TrainConfig, make_optimizer
from hifigan_tpu.train.train_step import audio_to_mel

Array = jax.Array

UNIT_PLAN_KEY_BASE = 70_000_000
FRAME_SAMPLES = 256          # default 16 ms at 16 kHz (upsample 8·8·2·2)
FRAME_SECONDS = FRAME_SAMPLES / 16_000


def upsample_ratio(code: CodeVocoderConfig) -> int:
    r = 1
    for f in code.upsample_factors:
        r *= f
    return r


def translate_plan(plan: list[tuple[str, float]]) -> list[tuple[str, float]]:
    """Source plan → translated plan: per pause-delimited word, reverse
    the (phone, duration) pairs and map phones through the toy
    translation's fixed permutation (s2st_task._PERM)."""
    from hifigan_tpu.train.s2st_task import _PERM

    out: list[tuple[str, float]] = []
    word: list[tuple[str, float]] = []
    for phone, dur in plan:
        if phone == "pau":
            out.extend((PHONES[_PERM[PHONE_TO_ID[p]]], d)
                       for p, d in reversed(word))
            word = []
            out.append((phone, dur))
        else:
            word.append((phone, dur))
    out.extend((PHONES[_PERM[PHONE_TO_ID[p]]], d) for p, d in reversed(word))
    return out


def plan_units_durations(
    plan: list[tuple[str, float]], max_dur: int,
    frame_seconds: float = FRAME_SECONDS,
) -> Tuple[np.ndarray, np.ndarray]:
    """Units (phone ids, pau=0) + per-unit frame durations by cumulative
    rounding (total drift < 1 frame)."""
    units, durs = [], []
    cum_s, cum_f = 0.0, 0
    for phone, dur in plan:
        cum_s += dur
        boundary = int(round(cum_s / frame_seconds))
        d = max(1, min(boundary - cum_f, max_dur))
        cum_f += d
        units.append(PHONE_TO_ID[phone])
        durs.append(d)
    return np.array(units, np.int32), np.array(durs, np.int32)


@dataclass(frozen=True)
class UnitVocoderTaskConfig:
    n_utterances: int = 256
    n_speakers: int = 32
    max_units: int = 72
    window_units: int = 16
    batch_size: int = 8
    code: CodeVocoderConfig = CodeVocoderConfig(
        unit_vocab_size=32, embed_dim=128, max_duration_per_unit=16)

    @property
    def frame_samples(self) -> int:
        return upsample_ratio(self.code)

    @property
    def frame_seconds(self) -> float:
        return self.frame_samples / 16_000

    @property
    def window_samples(self) -> int:
        return (self.window_units * self.code.max_duration_per_unit
                * self.frame_samples)


def build_unit_vocoder_bank(cfg: UnitVocoderTaskConfig, *,
                            idx_offset: int = 0) -> dict:
    """Render translated utterances → fixed-shape arrays: units
    ``[N, U]``, durs ``[N, U]``, cumdur ``[N, U+1]`` (frame prefix
    sums), counts ``[N]``, wav ``[N, S]``."""
    corpus = FormantSpeechCorpus(n_speakers=cfg.n_speakers)
    N, U = cfg.n_utterances, cfg.max_units
    units = np.zeros((N, U), np.int32)
    durs = np.ones((N, U), np.int32)
    counts = np.zeros(N, np.int32)
    wavs = []
    i, draw = 0, 0
    while i < N:
        spk = i % cfg.n_speakers
        _w, plan, ar = corpus.utterance(
            spk, 0, content=UNIT_PLAN_KEY_BASE + idx_offset + draw,
            return_plan=True)
        draw += 1
        t_plan = translate_plan(plan)
        u, d = plan_units_durations(t_plan, cfg.code.max_duration_per_unit,
                                    cfg.frame_seconds)
        if len(u) > U or len(u) < cfg.window_units:
            continue
        wav = corpus.render_plan(spk, t_plan, arousal=ar, seed=idx_offset + i)
        units[i, : len(u)] = u
        durs[i, : len(u)] = d
        counts[i] = len(u)
        wavs.append(wav)
        i += 1
    S = max(len(w) for w in wavs)
    S = -(-S // 128) * 128 + cfg.window_samples  # slack for window slicing
    wav_bank = np.zeros((N, S), np.float32)
    for j, w in enumerate(wavs):
        wav_bank[j, : len(w)] = w
    cumdur = np.zeros((N, U + 1), np.int32)
    cumdur[:, 1:] = np.cumsum(durs, axis=1)
    return dict(units=units, durs=durs, cumdur=cumdur, counts=counts,
                wav=wav_bank)


def make_unit_vocoder_train_step(
    code_vocoder: CodeVocoder,
    discs: Discriminators,
    train_cfg: TrainConfig,
    task_cfg: UnitVocoderTaskConfig,
    *,
    deep_feature_matching: bool = True,
    dur_loss_weight: float = 1.0,
    multi_steps: int = 1,
) -> Callable[..., Tuple[GanTrainState, dict]]:
    """One jitted program: sample unit windows + aligned audio from the
    HBM bank (banks passed as ARGUMENTS — large closure constants
    overflow the relay's remote-compile request), run the CodeHiFiGAN
    GAN step with teacher durations + duration-predictor supervision."""
    tx = make_optimizer(train_cfg)
    w = train_cfg.loss_weights
    B = task_cfg.batch_size
    Uw = task_cfg.window_units
    Sw = task_cfg.window_samples
    fs = task_cfg.frame_samples

    def sample(key: Array, bank: dict) -> dict:
        N = bank["units"].shape[0]
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (B,), 0, N)
        span = jnp.maximum(bank["counts"][i] - Uw, 1)
        wstart = (jax.random.uniform(k2, (B,)) * span).astype(jnp.int32)

        def get(row, s):
            u = jax.lax.dynamic_slice(bank["units"][row], (s,), (Uw,))
            d = jax.lax.dynamic_slice(bank["durs"][row], (s,), (Uw,))
            start_sample = bank["cumdur"][row, s] * fs
            a = jax.lax.dynamic_slice(bank["wav"][row], (start_sample,), (Sw,))
            return u, d, a

        u, d, a = jax.vmap(get)(i, wstart)
        return {"units": u, "durs": d, "audio": a}

    def step(state: GanTrainState, key: Array, bank: dict):
        batch = sample(key, bank)
        durs = batch["durs"]
        n_valid = durs.sum(axis=1) * fs  # [B]
        smask = (jnp.arange(Sw)[None, :] < n_valid[:, None]).astype(jnp.float32)
        real = batch["audio"] * smask

        def g_forward(gen_params):
            wav, _d, _n, log_dur = code_vocoder.apply(
                gen_params, batch["units"], durations=durs,
                return_log_dur=True)
            return wav[:, 0, :Sw], log_dur

        fake, _ = g_forward(state.gen_params)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(disc_params):
            out_real = discs.apply(disc_params, real)
            out_fake = discs.apply(disc_params, fake_sg)
            return discriminator_loss(
                out_real["mpd_outputs"] + out_real["msd_outputs"],
                out_fake["mpd_outputs"] + out_fake["msd_outputs"],
                w.adversarial_type)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_up, d_opt = tx.update(d_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_up)

        def g_loss_fn(gen_params):
            fake_g, log_dur = g_forward(gen_params)
            out_real = discs.apply(disc_params, real)
            out_fake = discs.apply(disc_params, fake_g)
            adv = generator_adversarial_loss(
                out_fake["mpd_outputs"] + out_fake["msd_outputs"],
                w.adversarial_type)
            if deep_feature_matching:
                fm = feature_matching_loss(
                    out_real["mpd_features"] + out_real["msd_features"],
                    out_fake["mpd_features"] + out_fake["msd_features"])
            else:
                fm = feature_matching_loss(
                    out_real["mpd_outputs"] + out_real["msd_outputs"],
                    out_fake["mpd_outputs"] + out_fake["msd_outputs"])
            mel_loss = mel_l1_loss(audio_to_mel(fake_g, train_cfg),
                                   audio_to_mel(real, train_cfg))
            dur_target = jnp.log(durs.astype(jnp.float32) + 1.0)
            dur_loss = jnp.mean(jnp.square(log_dur - dur_target))
            total = (w.adversarial * adv + w.feature_matching * fm
                     + w.mel * mel_loss + dur_loss_weight * dur_loss)
            aux = {"adv_loss": adv, "fm_loss": fm, "mel_loss": mel_loss,
                   "dur_loss": dur_loss}
            if w.multi_res_stft > 0:
                from hifigan_tpu.ops.stft import multi_resolution_stft_loss

                stft = multi_resolution_stft_loss(fake_g, real)
                total = total + w.multi_res_stft * stft
                aux["stft_loss"] = stft
            return total, aux

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params)
        g_up, g_opt = tx.update(g_grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_up)
        new_state = state.replace(
            step=state.step + 1, gen_params=gen_params,
            disc_params=disc_params, gen_opt_state=g_opt, disc_opt_state=d_opt)
        return new_state, {"generator_loss": g_loss,
                           "discriminator_loss": d_loss, **aux}

    if multi_steps > 1:

        def multi(state, keys, bank):
            state, ms = jax.lax.scan(
                lambda s, k: step(s, k, bank), state, keys,
                length=multi_steps)
            return state, jax.tree_util.tree_map(jnp.mean, ms)

        return jax.jit(multi, donate_argnums=(0,))

    return jax.jit(step, donate_argnums=(0,))


def create_unit_vocoder_state(
    rng: jax.Array,
    train_cfg: TrainConfig,
    task_cfg: UnitVocoderTaskConfig,
    dtype=jnp.float32,
) -> Tuple[GanTrainState, CodeVocoder, Discriminators]:
    cv = CodeVocoder(task_cfg.code, dtype=dtype)
    discs = Discriminators(dtype=dtype)
    tx = make_optimizer(train_cfg)
    g_rng, d_rng = jax.random.split(rng)

    @jax.jit
    def _init(g_rng, d_rng):
        units = jnp.zeros((2, task_cfg.window_units), jnp.int32)
        gen_params = cv.init(g_rng, units)
        wav = jnp.zeros((2, 1, task_cfg.window_samples))
        disc_params = discs.init(d_rng, wav)
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params, disc_params=disc_params,
            gen_opt_state=tx.init(gen_params),
            disc_opt_state=tx.init(disc_params))

    return _init(g_rng, d_rng), cv, discs
