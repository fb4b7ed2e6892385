"""Simultaneous S2ST model: chunked Conformer + dual CTC + simultaneous
text decoder + text-to-unit encoder + modified vocoder.

Capability parity with
``/root/reference/streamspeech_integration.py:181-414``
(``StreamSpeechWithModifiedVocoder``):

* dual CTC heads over the encoder (source ASR + target translation —
  the policy signals, ``:181-198``, ``:304-305``);
* 6-layer transformer text decoder with causal self-attention
  (``:200-252``);
* text-to-unit encoder: 3 stride-2 transposed convs (8× upsampling) +
  unit predictor over a 1000-unit vocabulary (``:254-290``);
* ``__call__`` returns all logits + the synthesised waveform
  (``:322-375``); ``streaming_forward`` is the per-chunk variant without
  the text decoder (``:377-414``).

TPU notes: chunked attention is a static mask (one compiled program per
chunk-length bucket); the vocoder path reuses
:class:`hifigan_tpu.models.vocoder.ModifiedVocoder`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.models.conformer import ChunkedConformer
from hifigan_tpu.models.generator import GeneratorConfig
from hifigan_tpu.models.layers import (
    TransformerDecoderLayer,
    causal_mask,
    sinusoidal_positions,
)
from hifigan_tpu.models.vocoder import ModifiedVocoder
from hifigan_tpu.ops import conv as conv_ops

Array = jax.Array

# Forward-semantics revision: bumped whenever a forward pass changes
# numerics under an UNCHANGED parameter tree (round 3: Emotion2Vec input
# CMVN / feature norm / 0.3× positional scale; decoder sqrt(d) embedding
# scale).  Written into streamspeech_config.json at train time and
# checked on restore, so a stale checkpoint fails loudly instead of
# silently computing different outputs (ADVICE r3).
FEATURE_REV = 2


@dataclass(frozen=True)
class StreamSpeechConfig:
    """Defaults per reference ``streamspeech_integration.py:295-320``."""

    input_dim: int = 80
    hidden_dim: int = 512
    encoder_layers: int = 12
    decoder_layers: int = 6
    num_heads: int = 8
    vocab_size: int = 32_000
    unit_vocab_size: int = 1_000
    chunk_size: int = 32
    speaker_dim: int = 192
    emotion_dim: int = 256
    # vocoder sizes (small overrides for tests)
    vocoder_hidden: int = 512
    vocoder_upsample: tuple = (8, 8, 2, 2)
    ecapa_channels: int = 512
    emo_hidden: int = 512
    emo_layers: int = 6

    def generator_config(self) -> GeneratorConfig:
        return GeneratorConfig(
            input_channels=self.input_dim,
            hidden_channels=self.vocoder_hidden,
            upsample_factors=self.vocoder_upsample,
            speaker_dim=self.speaker_dim,
            emotion_dim=self.emotion_dim,
        )


class CTCHead(nn.Module):
    """Linear projection hidden→vocab (reference ``CTCDecoder``, :181-198)."""

    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: Array) -> Array:
        return nn.Dense(self.vocab_size, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="proj")(h.astype(jnp.float32))


class SimultaneousTextDecoder(nn.Module):
    """Causal transformer decoder over encoder memory (reference :200-252)."""

    hidden_dim: int
    vocab_size: int
    num_layers: int = 6
    num_heads: int = 8
    max_len: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory: Array, target_ids: Array,
                 cross_mask: Optional[Array] = None,
                 return_features: bool = False):
        T = target_ids.shape[1]
        emb = nn.Embed(self.vocab_size, self.hidden_dim,
                       param_dtype=jnp.float32, name="token_embedding")(target_ids)
        # sqrt(d) embedding scale (fairseq/transformer standard): the
        # fan-in-initialised embedding is ~1/sqrt(d) std vs the ±1
        # positional table — unscaled, token identity is drowned and the
        # decoder cannot train (observed: CE pinned near ln-uniform)
        import math as _math

        emb = emb * _math.sqrt(self.hidden_dim)
        pos = sinusoidal_positions(self.max_len, self.hidden_dim)
        x = (emb + jnp.asarray(pos[:T])[None]).astype(self.dtype)
        self_mask = causal_mask(T)
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.num_heads, 4 * self.hidden_dim, dtype=self.dtype,
                name=f"layer_{i}",
            )(x, memory.astype(self.dtype), self_mask, cross_mask)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          name="output_proj")(x.astype(jnp.float32))
        if return_features:
            # pre-projection features — what the reference agent feeds
            # into the synthesizer encoder (mt_decoder features_only,
            # /root/reference/agent/speech_to_speech.streamspeech.agent.py:638-679)
            return logits, x
        return logits


class TextToUnitEncoder(nn.Module):
    """3× stride-2 transposed conv (8× upsampling) + unit predictor
    (reference :254-290)."""

    hidden_dim: int
    unit_vocab_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: Array) -> Array:
        x = h.astype(self.dtype)
        d = self.hidden_dim
        for i in range(3):
            w = self.param(f"up_{i}_kernel", nn.initializers.normal(0.02),
                           (d, d, 4), jnp.float32)
            b = self.param(f"up_{i}_bias", nn.initializers.zeros, (d,), jnp.float32)
            x = conv_ops.conv_transpose1d(x, w.astype(self.dtype), b, stride=2, padding=1)
            x = nn.relu(x)
        return nn.Dense(self.unit_vocab_size, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="unit_predictor")(x.astype(jnp.float32))


class StreamSpeechS2ST(nn.Module):
    """The composed simultaneous S2ST system."""

    config: StreamSpeechConfig = StreamSpeechConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = ChunkedConformer(
            input_dim=cfg.input_dim, hidden_dim=cfg.hidden_dim,
            num_layers=cfg.encoder_layers, num_heads=cfg.num_heads,
            chunk_size=cfg.chunk_size, dtype=self.dtype,
        )
        self.source_ctc = CTCHead(cfg.vocab_size)
        self.target_ctc = CTCHead(cfg.vocab_size)
        self.text_decoder = SimultaneousTextDecoder(
            cfg.hidden_dim, cfg.vocab_size, cfg.decoder_layers, cfg.num_heads,
            dtype=self.dtype,
        )
        self.t2u_encoder = TextToUnitEncoder(
            cfg.hidden_dim, cfg.unit_vocab_size, dtype=self.dtype
        )
        # learned READ/WRITE transition head (reference: the HMT's
        # trained transition model over translation states,
        # /root/reference/agent/mt/hmt_sim_sequence_generator.py:449-470).
        # Scores p(write | decoder state under the current read prefix);
        # trained self-supervised in train/s2st_task.py (label: can the
        # decoder already produce the correct token with this prefix?).
        self.transition_head = nn.Dense(1, dtype=jnp.float32,
                                        param_dtype=jnp.float32,
                                        name="transition_head")
        self.vocoder = ModifiedVocoder(
            cfg.generator_config(),
            ecapa_channels=cfg.ecapa_channels,
            emo_hidden=cfg.emo_hidden,
            emo_layers=cfg.emo_layers,
            dtype=self.dtype,
        )

    def __call__(
        self,
        mel: Array,  # [B, T, n_mels] (reference streamspeech layout)
        target_ids: Optional[Array] = None,
        speaker_emb: Optional[Array] = None,
        emotion_emb: Optional[Array] = None,
        *,
        chunked: bool = False,
        cross_mask: Optional[Array] = None,
        run_vocoder: bool = True,
        decoder_units_out: bool = False,
    ) -> dict:
        """``cross_mask``: optional decoder→encoder attention mask (e.g.
        a source-prefix mask for simultaneous-robust training).
        ``run_vocoder=False`` skips the mel-vocoder branch — the
        multitask S2ST trainer only needs the text/unit heads
        (:mod:`hifigan_tpu.train.s2st_task`).  ``decoder_units_out``
        additionally returns T2U unit logits over the decoder features
        (single decoder pass; see :meth:`decoder_units`)."""
        enc = self.encoder(mel, chunked=chunked)
        out = {
            "encoder_outputs": enc,
            "source_ctc_logits": self.source_ctc(enc),
            "target_ctc_logits": self.target_ctc(enc),
            "unit_logits": self.t2u_encoder(enc),
        }
        if target_ids is not None:
            if decoder_units_out:
                text_logits, feats = self.text_decoder(
                    enc, target_ids, cross_mask=cross_mask,
                    return_features=True)
                out["text_logits"] = text_logits
                out["decoder_unit_logits"] = self.t2u_encoder(feats)
                # stop-gradient: the gate learns from the decoder, the
                # decoder is not distorted by the gate's BCE
                out["write_logits"] = self.transition_head(
                    jax.lax.stop_gradient(feats).astype(jnp.float32))[..., 0]
            else:
                out["text_logits"] = self.text_decoder(enc, target_ids,
                                                       cross_mask=cross_mask)
        if run_vocoder:
            voc = self.vocoder(jnp.transpose(mel, (0, 2, 1)), speaker_emb,
                               emotion_emb)
            out["generated_waveform"] = voc["waveform"]
            out["speaker_embedding"] = voc["speaker_embedding"]
            out["emotion_embedding"] = voc["emotion_embedding"]
        return out

    def decoder_units(
        self,
        memory: Array,
        target_ids: Array,
        cross_mask: Optional[Array] = None,
    ) -> Array:
        """Unit logits from MT-*decoder* features (the reference agent's
        wiring: mt_decoder features → synthesizer encoder →
        CTCSequenceGenerator, ``/root/reference/agent/
        speech_to_speech.streamspeech.agent.py:638-679``).  The T2U
        parameters are shared with the encoder-fed path, so training
        either path trains both.  Returns ``[B, 8·L_dec, unit_vocab]``."""
        _logits, feats = self.text_decoder(
            memory, target_ids, cross_mask=cross_mask, return_features=True)
        return self.t2u_encoder(feats)

    def decoder_scores(
        self,
        memory: Array,
        target_ids: Array,
        cross_mask: Optional[Array] = None,
    ):
        """(text logits, write logits) under a read-prefix cross mask —
        the HMT scorer's one-pass program (logits for the joint
        token×read score, write logits for the learned READ/WRITE
        gate)."""
        logits, feats = self.text_decoder(
            memory, target_ids, cross_mask=cross_mask, return_features=True)
        write = self.transition_head(feats.astype(jnp.float32))[..., 0]
        return logits, write

    def streaming_forward(
        self,
        mel_chunk: Array,
        speaker_emb: Optional[Array] = None,
        emotion_emb: Optional[Array] = None,
    ) -> dict:
        """Per-chunk variant (no text decoder) — reference :377-414."""
        enc = self.encoder(mel_chunk, chunked=True)
        voc = self.vocoder(jnp.transpose(mel_chunk, (0, 2, 1)), speaker_emb, emotion_emb)
        return {
            "encoder_outputs": enc,
            "source_ctc_logits": self.source_ctc(enc),
            "target_ctc_logits": self.target_ctc(enc),
            "unit_logits": self.t2u_encoder(enc),
            "generated_waveform": voc["waveform"],
        }
