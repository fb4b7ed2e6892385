"""The jitted alternating GAN train step.

One compiled program per step (vs. the reference's two separate
``backward()``/``step()`` phases with host round-trips —
``/root/reference/hifigan_modified/complete_vocoder.py:199-233``):

1. ``fake = G(mel, spk?, emo?)``
2. discriminator update on ``(real, stop_gradient(fake))``
   (LSGAN real→1 / fake→0)
3. generator update **against the updated discriminator** (matching the
   reference's ordering, where the torch optimizer has already stepped
   D before G's losses are computed): adversarial + 10·FM + 45·mel,
   with the mel of the generated audio computed by a **real**
   log-mel transform (fixes the reference's placeholder —
   ``complete_vocoder.py:210-212``).

The step is pure (state in, state out) so it shards with pjit over an
ICI mesh (see :mod:`hifigan_tpu.parallel`): batch data-parallel,
gradients all-reduced by XLA.

The batch carries raw audio only; mel targets are computed **on device**
(host→device traffic = waveform bytes, mel/STFT runs on the TPU).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from hifigan_tpu.models.discriminators import Discriminators
from hifigan_tpu.models.vocoder import ModifiedVocoder
from hifigan_tpu.ops.stft import log_mel_spectrogram
from hifigan_tpu.train.losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    mel_l1_loss,
)
from hifigan_tpu.train.state import GanTrainState, TrainConfig, make_optimizer

Array = jax.Array


def audio_to_mel(audio: Array, cfg: TrainConfig) -> Array:
    """``[B, T_samples] → [B, n_mels, T_frames]`` log-mel (reference mel
    layout), with frames trimmed to ``T_samples // hop`` so that
    ``generator(mel)`` reproduces exactly ``T_samples`` samples."""
    mel = log_mel_spectrogram(audio, cfg.mel)  # [B, frames, n_mels]
    frames = audio.shape[-1] // cfg.mel.hop_length
    return jnp.transpose(mel[:, :frames, :], (0, 2, 1))


def make_train_step(
    vocoder: ModifiedVocoder,
    discs: Discriminators,
    cfg: TrainConfig,
    *,
    deep_feature_matching: bool = False,
    donate: bool = True,
    remat: bool = False,
    multi_steps: int = 1,
    sample_fn: Optional[Callable] = None,
) -> Callable[[GanTrainState, dict], tuple[GanTrainState, dict]]:
    """Build the jitted train step.

    ``batch``: ``{"audio": [B, T_samples]}`` plus optional ``"mel"``
    ``[B, n_mels, T]`` and (if ``cfg.precompute_embeddings``)
    ``"speaker"``/``"emotion"`` embeddings.

    ``multi_steps > 1``: the returned function takes batches with a
    leading ``[multi_steps, ...]`` axis and runs them in ONE compiled
    ``lax.scan`` program (amortises host→device dispatch — on a
    remote-relay rig the per-step RTT is ~120 ms, 1.6× the device step
    itself).  Returned metrics are the scan-window means.

    ``sample_fn`` (on-device data — :mod:`hifigan_tpu.train.device_data`):
    the returned function takes PRNG key(s) instead of batches —
    ``[2]`` uint32 for a single step, ``[multi_steps, 2]`` for the
    fused scan — and draws each batch from the HBM-resident corpus
    inside the compiled program (per-call host traffic: one key).
    """
    tx = make_optimizer(cfg)
    w = cfg.loss_weights

    def generate(gen_params, batch, mel):
        if cfg.precompute_embeddings:
            out = vocoder.apply(gen_params, mel, batch["speaker"], batch["emotion"])
        else:
            out = vocoder.apply(gen_params, mel)
        return out["waveform"][:, 0, :]  # [B, T_samples]

    if remat:
        # rematerialise the generator forward in the G-grad pass
        # (trades FLOPs for activation memory — SURVEY build guidance)
        generate = jax.checkpoint(generate, static_argnums=())

    def step(state: GanTrainState, batch: dict) -> tuple[GanTrainState, dict]:
        real = batch["audio"]
        if real.ndim == 3:
            real = real[:, 0, :]
        mel = batch.get("mel")
        if mel is None:
            mel = audio_to_mel(real, cfg)
        real = real[:, : mel.shape[-1] * cfg.mel.hop_length]

        fake = generate(state.gen_params, batch, mel)

        # --- discriminator phase (fake detached) ---
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(disc_params):
            out_real = discs.apply(disc_params, real)
            out_fake = discs.apply(disc_params, fake_sg)
            loss = discriminator_loss(
                out_real["mpd_outputs"] + out_real["msd_outputs"],
                out_fake["mpd_outputs"] + out_fake["msd_outputs"],
                w.adversarial_type,
            )
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, d_opt_state = tx.update(d_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # --- generator phase (against the updated discriminator) ---
        def g_loss_fn(gen_params):
            fake_g = generate(gen_params, batch, mel)
            out_real = discs.apply(disc_params, real)
            out_fake = discs.apply(disc_params, fake_g)
            adv = generator_adversarial_loss(
                out_fake["mpd_outputs"] + out_fake["msd_outputs"],
                w.adversarial_type,
            )
            if deep_feature_matching:
                fm = feature_matching_loss(
                    out_real["mpd_features"] + out_real["msd_features"],
                    out_fake["mpd_features"] + out_fake["msd_features"],
                )
            else:
                fm = feature_matching_loss(
                    out_real["mpd_outputs"] + out_real["msd_outputs"],
                    out_fake["mpd_outputs"] + out_fake["msd_outputs"],
                )
            gen_mel = audio_to_mel(fake_g, cfg)
            mel_loss = mel_l1_loss(gen_mel, mel)
            total = w.adversarial * adv + w.feature_matching * fm + w.mel * mel_loss
            aux = {"adv_loss": adv, "fm_loss": fm, "mel_loss": mel_loss}
            if w.multi_res_stft > 0:
                from hifigan_tpu.ops.stft import multi_resolution_stft_loss

                stft_loss = multi_resolution_stft_loss(fake_g, real)
                total = total + w.multi_res_stft * stft_loss
                aux["stft_loss"] = stft_loss
            return total, aux

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params
        )
        g_updates, g_opt_state = tx.update(g_grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=g_opt_state,
            disc_opt_state=d_opt_state,
        )
        metrics = {
            "generator_loss": g_loss,
            "discriminator_loss": d_loss,
            **aux,
        }
        return new_state, metrics

    body = step
    if sample_fn is not None:

        def body(state: GanTrainState, key):
            return step(state, {"audio": sample_fn(key)})

    if multi_steps > 1:

        def multi(state: GanTrainState, xs):
            state, ms = jax.lax.scan(body, state, xs, length=multi_steps)
            return state, jax.tree_util.tree_map(lambda x: jnp.mean(x), ms)

        return jax.jit(multi, donate_argnums=(0,) if donate else ())

    return jax.jit(body, donate_argnums=(0,) if donate else ())


def make_eval_step(
    vocoder: ModifiedVocoder, cfg: TrainConfig
) -> Callable[[dict, dict], dict]:
    """Jitted inference: batch → waveform + mel-L1 vs. target."""

    def step(gen_params, batch):
        real = batch["audio"]
        if real.ndim == 3:
            real = real[:, 0, :]
        mel = batch.get("mel")
        if mel is None:
            mel = audio_to_mel(real, cfg)
        if cfg.precompute_embeddings:
            out = vocoder.apply(gen_params, mel, batch["speaker"], batch["emotion"])
        else:
            out = vocoder.apply(gen_params, mel)
        fake = out["waveform"][:, 0, :]
        gen_mel = audio_to_mel(fake, cfg)
        return {
            "waveform": out["waveform"],
            "mel_l1": mel_l1_loss(gen_mel, mel),
        }

    return jax.jit(step)
