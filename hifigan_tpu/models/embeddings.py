"""Conditioning embedding encoders: ECAPA-TDNN (speaker, 192-d) and
Emotion2Vec (emotion, 256-d), plus the combined extractor facade.

Capability parity with ``/root/reference/embedding_extractors.py``:

* **EcapaTdnn** (``:13-169``): Conv1d stem → 3 SE-Res2Blocks (dilations
  2/3/4: 1×1 conv → Res2Net hierarchical split-conv → 1×1 conv → SE
  channel gating → residual) → channel expansion to 3·512 → attentive
  statistical pooling (softmax attention over time, concat mean‖std) →
  Linear → 192-d, L2-normalised; optional speaker-classifier logits.
* **Emotion2Vec** (``:171-256``): 3-layer Conv1d feature extractor →
  6-layer transformer encoder (d=512, 8 heads) → frame projection
  ``[B,T,256]`` + mean-pooled L2-normalised utterance embedding
  ``[B,256]``; optional 8-way emotion classifier.
* **EmbeddingExtractor** (``:258-284``): ``mel [B,80,T] → (spk_192,
  emo_256)``.

TPU-first notes: all norms are LayerNorm/GroupNorm (deviation from the
reference's BatchNorm1d, which would thread mutable running statistics
through the jitted GAN step; recorded per SURVEY.md §7).  Res2Net's
hierarchical loop is over a *static* scale count so it unrolls into a
fixed op graph.  Similarity utilities (cosine similarity, verification
threshold 0.7 — ``/root/reference/speaker_embedding/ecapa_tdnn.py:198-225``)
live in :mod:`hifigan_tpu.eval.metrics`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.models.layers import TransformerEncoderLayer, sinusoidal_positions
from hifigan_tpu.ops import conv as conv_ops

Array = jax.Array


class SEModule(nn.Module):
    """Squeeze-excitation channel gating (reference ``SE_Module``,
    embedding_extractors.py:151-169)."""

    channels: int
    bottleneck: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x.astype(jnp.float32), axis=1)  # [B, C]
        s = nn.Dense(self.bottleneck, param_dtype=jnp.float32, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, param_dtype=jnp.float32, name="fc2")(s)
        gate = jax.nn.sigmoid(s)[:, None, :]
        return (x * gate).astype(x.dtype)


class SERes2Block(nn.Module):
    """SE-Res2Net block (reference ``SE_Res2Block``,
    embedding_extractors.py:100-149): 1×1 → Res2Net split-scale conv
    chain → 1×1 → SE → +residual."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c, s = self.channels, self.scale
        width = c // s
        residual = x

        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="conv1x1_in")(x)
        h = nn.relu(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_in")(h).astype(self.dtype)

        # Res2Net: split channels into `scale` groups; group i's conv sees
        # its own split plus the previous group's output (hierarchical
        # receptive-field growth). Static python loop -> unrolled graph.
        splits = jnp.split(h, s, axis=-1)
        outs = [splits[0]]
        prev = None
        pad = (self.kernel_size - 1) * self.dilation // 2
        for i in range(1, s):
            inp = splits[i] if prev is None else splits[i] + prev
            w = self.param(
                f"res2_kernel_{i}", nn.initializers.normal(0.02),
                (self.kernel_size, width, width), jnp.float32,
            )
            b = self.param(f"res2_bias_{i}", nn.initializers.zeros, (width,), jnp.float32)
            prev = nn.relu(conv_ops.conv1d(inp, w.astype(self.dtype), b,
                                           padding=pad, dilation=self.dilation))
            outs.append(prev)
        h = jnp.concatenate(outs, axis=-1)

        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="conv1x1_out")(h)
        h = nn.relu(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(h).astype(self.dtype)
        h = SEModule(c, dtype=self.dtype, name="se")(h)
        return h + residual


class AttentiveStatsPooling(nn.Module):
    """Attentive statistical pooling: softmax attention over time, output
    concat(weighted mean, weighted std) (reference
    embedding_extractors.py:64-92)."""

    attention_channels: int = 128

    @nn.compact
    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        a = nn.Dense(self.attention_channels, param_dtype=jnp.float32, name="att1")(xf)
        a = jnp.tanh(a)
        a = nn.Dense(xf.shape[-1], param_dtype=jnp.float32, name="att2")(a)
        w = jax.nn.softmax(a, axis=1)  # [B, T, C] — per-channel temporal attention
        mean = jnp.sum(w * xf, axis=1)
        var = jnp.sum(w * jnp.square(xf), axis=1) - jnp.square(mean)
        std = jnp.sqrt(jnp.clip(var, 1e-9))
        return jnp.concatenate([mean, std], axis=-1)


class EcapaTdnn(nn.Module):
    """Mel-input ECAPA-TDNN speaker encoder → L2-normalised 192-d."""

    n_mels: int = 80
    channels: int = 512
    embedding_dim: int = 192
    num_speakers: Optional[int] = None  # set to add a classifier head
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: Array, train: bool = False):
        """mel: ``[B, n_mels, T]`` (reference layout) or ``[B, T, n_mels]``."""
        if mel.shape[1] == self.n_mels and mel.shape[-1] != self.n_mels:
            mel = jnp.transpose(mel, (0, 2, 1))
        x = mel.astype(self.dtype)
        w = self.param("stem_kernel", nn.initializers.normal(0.02),
                       (5, self.n_mels, self.channels), jnp.float32)
        b = self.param("stem_bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        x = nn.relu(conv_ops.conv1d(x, w.astype(self.dtype), b, padding=2))
        x = nn.LayerNorm(dtype=jnp.float32, name="stem_norm")(x).astype(self.dtype)

        feats = []
        for i, d in enumerate((2, 3, 4)):
            x = SERes2Block(self.channels, 3, d, dtype=self.dtype, name=f"block_{i}")(x)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)  # [B, T, 3C]
        x = nn.relu(nn.Dense(3 * self.channels, dtype=self.dtype,
                             param_dtype=jnp.float32, name="expand")(x))
        pooled = AttentiveStatsPooling(name="asp")(x)  # [B, 6C] fp32
        emb = nn.Dense(self.embedding_dim, param_dtype=jnp.float32, name="embed")(pooled)
        emb = nn.LayerNorm(name="embed_norm")(emb)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-9)
        if train and self.num_speakers:
            logits = nn.Dense(self.num_speakers, param_dtype=jnp.float32,
                              name="classifier")(emb)
            return emb, logits
        return emb


class Emotion2Vec(nn.Module):
    """Mel-input Emotion2Vec emotion encoder → frame features [B,T,256] +
    L2-normalised utterance embedding [B,256]."""

    n_mels: int = 80
    hidden_dim: int = 512
    embedding_dim: int = 256
    num_layers: int = 6
    num_heads: int = 8
    num_emotions: int = 8  # neutral/happy/sad/angry/fearful/disgusted/surprised/excited
    max_len: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: Array, train: bool = False, return_frames: bool = False):
        if mel.shape[1] == self.n_mels and mel.shape[-1] != self.n_mels:
            mel = jnp.transpose(mel, (0, 2, 1))
        # per-utterance input CMVN (parameter-free): without it the raw
        # log-mel scale leaves the conv-stem output tiny relative to the
        # position encodings, the transformer output collapses to a
        # position-only function, and the mean-pooled embedding is
        # input-independent (measured batch-std ≈ 9e-4 at init — the
        # emotion head then fits class priors and never learns)
        mf = mel.astype(jnp.float32)
        mu = mf.mean(axis=(1, 2), keepdims=True)
        sd = jnp.maximum(mf.std(axis=(1, 2), keepdims=True), 1e-5)
        x = ((mf - mu) / sd).astype(self.dtype)
        # 3-layer conv feature extractor (reference :178-186)
        for i, ch in enumerate((256, 384, self.hidden_dim)):
            w = self.param(f"fe_{i}_kernel", nn.initializers.normal(0.02),
                           (3, x.shape[-1], ch), jnp.float32)
            b = self.param(f"fe_{i}_bias", nn.initializers.zeros, (ch,), jnp.float32)
            x = nn.gelu(conv_ops.conv1d(x, w.astype(self.dtype), b, padding=1))
        # parameter-free feature norm so the content signal is not
        # drowned by the positional encoding (the conv stem's init-scale
        # output is ~10× smaller than the sinusoid table; position-
        # dominant frames mean-pool to an input-independent embedding)
        xf = x.astype(jnp.float32)
        fmu = xf.mean(axis=-1, keepdims=True)
        fsd = jnp.maximum(xf.std(axis=-1, keepdims=True), 1e-5)
        x = ((xf - fmu) / fsd).astype(self.dtype)
        pos = sinusoidal_positions(self.max_len, self.hidden_dim)
        x = x + 0.3 * jnp.asarray(pos[: x.shape[1]])[None].astype(self.dtype)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.num_heads, 4 * self.hidden_dim, dtype=self.dtype, name=f"layer_{i}"
            )(x)
        frames = nn.Dense(self.embedding_dim, param_dtype=jnp.float32,
                          name="frame_proj")(x.astype(jnp.float32))
        utt = jnp.mean(frames, axis=1)
        utt = utt / jnp.linalg.norm(utt, axis=-1, keepdims=True).clip(1e-9)
        if train:
            logits = nn.Dense(self.num_emotions, param_dtype=jnp.float32,
                              name="classifier")(utt)
            return (utt, frames, logits) if return_frames else (utt, logits)
        return (utt, frames) if return_frames else utt


class EmbeddingExtractor(nn.Module):
    """Combined ``mel → (speaker_192, emotion_256)`` facade
    (reference embedding_extractors.py:258-284)."""

    speaker_dim: int = 192
    emotion_dim: int = 256
    n_mels: int = 80
    ecapa_channels: int = 512
    emo_hidden: int = 512
    emo_layers: int = 6
    emo_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: Array) -> Tuple[Array, Array]:
        spk = EcapaTdnn(n_mels=self.n_mels, channels=self.ecapa_channels,
                        embedding_dim=self.speaker_dim, dtype=self.dtype,
                        name="ecapa")(mel)
        emo = Emotion2Vec(n_mels=self.n_mels, hidden_dim=self.emo_hidden,
                          num_layers=self.emo_layers, num_heads=self.emo_heads,
                          embedding_dim=self.emotion_dim, dtype=self.dtype,
                          name="emotion2vec")(mel)
        return spk, emo
