"""Unit-sequence vocoder (CodeHiFiGAN) with duration prediction.

Capability parity with ``/root/reference/agent/tts/codehifigan.py:9-95``
(``CodeGenerator``: unit embedding → VariancePredictor durations →
``repeat_interleave`` → HiFi-GAN upsampling, optional speaker channel)
and ``/root/reference/agent/tts/vocoder.py:30-108``
(``CodeHiFiGANVocoderWithDur``: returns **(wav, dur)** so the streaming
agent can emit only the new duration-aligned tail —
``dur[-len(new_units):].sum() · 320`` samples,
``agent/speech_to_speech.streamspeech.agent.py:743-770``).

TPU-native duration expansion: ``repeat_interleave`` is dynamic-shape by
nature, so frames are expanded to a **static** maximum length with a
``searchsorted`` gather over the duration cumsum plus a validity mask
(SURVEY.md §7 "hard parts").  The waveform comes back padded with an
explicit valid-sample count.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.models.generator import HiFiGANV1Generator
from hifigan_tpu.ops import conv as conv_ops

Array = jax.Array


class VariancePredictor(nn.Module):
    """conv → ReLU → LN → conv → ReLU → LN → linear, per-unit scalar
    (fairseq ``VariancePredictor`` as used at ``codehifigan.py:59-66``)."""

    hidden: int = 256
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(2):
            w = self.param(f"conv_{i}_kernel", nn.initializers.normal(0.02),
                           (self.kernel_size, x.shape[-1], self.hidden), jnp.float32)
            b = self.param(f"conv_{i}_bias", nn.initializers.zeros, (self.hidden,), jnp.float32)
            x = nn.relu(conv_ops.conv1d(x.astype(self.dtype), w.astype(self.dtype), b,
                                        padding=(self.kernel_size - 1) // 2))
            x = nn.LayerNorm(dtype=jnp.float32, name=f"ln_{i}")(x).astype(self.dtype)
        return nn.Dense(1, param_dtype=jnp.float32, name="proj")(
            x.astype(jnp.float32)
        )[..., 0]


def expand_by_durations(
    frames: Array, durations: Array, max_len: int
) -> Tuple[Array, Array, Array]:
    """Static-shape ``repeat_interleave``.

    Args:
      frames: ``[B, U, D]``; durations ``[B, U]`` (int ≥ 0).
    Returns:
      (expanded ``[B, max_len, D]``, valid mask ``[B, max_len]``,
      total lengths ``[B]``).
    """
    cum = jnp.cumsum(durations, axis=-1)  # [B, U]
    total = cum[:, -1]
    t = jnp.arange(max_len)[None, :]  # [1, L]
    # unit index owning output frame t: first u with cum[u] > t
    idx = jnp.sum((cum[:, None, :] <= t[:, :, None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, frames.shape[1] - 1)
    expanded = jnp.take_along_axis(frames, idx[..., None], axis=1)
    mask = t < total[:, None]
    return expanded * mask[..., None].astype(frames.dtype), mask, total


@dataclass(frozen=True)
class CodeVocoderConfig:
    unit_vocab_size: int = 1000
    embed_dim: int = 128
    upsample_factors: Tuple[int, ...] = (8, 8, 2, 2)  # 256x = 16ms/frame at 16k
    hidden_channels: int = 512
    max_duration_per_unit: int = 8
    speaker_dim: int = 0  # >0: concat a speaker embedding channel (codehifigan.py:68-93)
    dur_prediction: bool = True
    # F0 conditioning (reference codehifigan.py:27-31, 68-79): raw scalar
    # channel, or a quantized-bin embedding when ``f0_quant_bins > 0``.
    # When enabled the caller must always pass ``f0``.
    f0: bool = False
    f0_quant_bins: int = 0


class CodeVocoder(nn.Module):
    """``(units [B, U], spk?) → (wav [B, 1, L_max], dur [B, U], n_samples [B])``."""

    config: CodeVocoderConfig = CodeVocoderConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        units: Array,
        speaker_emb: Optional[Array] = None,
        durations: Optional[Array] = None,
        f0: Optional[Array] = None,
        return_log_dur: bool = False,
    ):
        """``durations``: teacher durations (training) — the predictor
        still runs so its log-durations can be supervised
        (``return_log_dur=True`` appends them to the return tuple;
        fairseq trains the VariancePredictor exactly this way while
        expanding with ground truth)."""
        cfg = self.config
        emb = nn.Embed(cfg.unit_vocab_size, cfg.embed_dim,
                       param_dtype=jnp.float32, name="unit_embedding")(units)
        log_dur = None
        if cfg.dur_prediction:
            log_dur = VariancePredictor(dtype=self.dtype, name="duration_predictor")(emb)
        if durations is None and log_dur is not None:
            durations = jnp.clip(
                jnp.round(jnp.exp(log_dur) - 1).astype(jnp.int32),
                1, cfg.max_duration_per_unit,
            )
        elif durations is None:
            durations = jnp.ones(units.shape, jnp.int32)
        max_frames = units.shape[1] * cfg.max_duration_per_unit
        frames, mask, total = expand_by_durations(emb, durations, max_frames)
        if cfg.f0:
            # F0 aligns to *expanded* frame time (the reference concatenates
            # after repeat_interleave — codehifigan.py:68-79); nearest-repeat
            # upsample to max_frames (the reference's ``_upsample`` requires
            # exact divisibility too, codehifigan.py:44-50)
            assert f0 is not None, "config.f0 is set: an f0 input is required"
            if cfg.f0_quant_bins > 0:
                f0_feat = nn.Embed(
                    cfg.f0_quant_bins, cfg.embed_dim,
                    param_dtype=jnp.float32, name="f0_quant_embedding",
                )(f0.astype(jnp.int32))  # [B, Tf, E]
            else:
                f0_feat = f0[..., None]  # [B, Tf, 1] raw scalar channel
            t_f0 = f0_feat.shape[1]
            if t_f0 != max_frames:
                assert max_frames % t_f0 == 0, (
                    f"f0 length {t_f0} must divide the frame budget {max_frames}"
                )
                f0_feat = jnp.repeat(f0_feat, max_frames // t_f0, axis=1)
            frames = jnp.concatenate(
                [frames, f0_feat.astype(frames.dtype) * mask[..., None].astype(frames.dtype)],
                axis=-1,
            )
        if cfg.speaker_dim and speaker_emb is not None:
            spk = jnp.broadcast_to(
                speaker_emb[:, None, :], (*frames.shape[:2], speaker_emb.shape[-1])
            )
            frames = jnp.concatenate([frames, spk.astype(frames.dtype)], axis=-1)
        gen = HiFiGANV1Generator(
            input_channels=frames.shape[-1],
            hidden_channels=cfg.hidden_channels,
            upsample_factors=cfg.upsample_factors,
            dtype=self.dtype,
            name="generator",
        )
        wav = gen(jnp.transpose(frames, (0, 2, 1)))  # [B, 1, max_frames * ratio]
        ratio = 1
        for f in cfg.upsample_factors:
            ratio *= f
        n_samples = total * ratio
        sample_mask = (jnp.arange(wav.shape[-1])[None] < n_samples[:, None])
        wav = wav * sample_mask[:, None, :]
        if return_log_dur:
            return wav, durations, n_samples, log_dur
        return wav, durations, n_samples
