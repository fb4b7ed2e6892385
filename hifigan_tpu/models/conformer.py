"""Chunked-attention Conformer encoder for streaming speech.

Capability parity with ``/root/reference/streamspeech_integration.py:13-179``:
input proj 80→512 → sinusoidal positional encoding → N Conformer layers
(each: MHA + FFN + conv module, all post-norm residual) → output proj.
The conv module is pointwise(×2 expansion) → GLU → depthwise k=15 →
norm → ReLU → pointwise (``:116-158``).

TPU notes: the chunk attention mask is a static boolean built from the
chunk size (:func:`hifigan_tpu.models.layers.chunk_mask`) so one
compiled program serves every step of a stream; the depthwise conv runs
channels-last; norms are LayerNorm (deviation from the reference's
BatchNorm1d inside the conv module — no mutable batch stats under jit,
recorded per SURVEY.md §7).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.models.layers import (
    MultiHeadAttention,
    chunk_mask,
    sinusoidal_positions,
)
from hifigan_tpu.ops import conv as conv_ops

Array = jax.Array


class ConformerConvModule(nn.Module):
    """pointwise → GLU → depthwise(k=15) → norm → ReLU → pointwise.

    ``causal=True`` left-pads the depthwise conv (k−1, 0) so no future
    frames leak — required for exact chunked-streaming equivalence (the
    reference's symmetric padding looks 7 frames ahead even under a
    chunk mask; deviation recorded per SURVEY.md §7)."""

    hidden_dim: int
    depthwise_kernel: int = 15
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.hidden_dim
        h = nn.Dense(2 * d, dtype=self.dtype, param_dtype=jnp.float32, name="pw1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        w = self.param(
            "dw_kernel", nn.initializers.normal(0.02),
            (self.depthwise_kernel, 1, d), jnp.float32,
        )
        wb = self.param("dw_bias", nn.initializers.zeros, (d,), jnp.float32)
        k = self.depthwise_kernel
        pad = (k - 1, 0) if self.causal else ((k - 1) // 2, (k - 1) // 2)
        h = conv_ops.conv1d(
            h, w.astype(self.dtype), wb, padding=pad, groups=d,
        )
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(h).astype(self.dtype)
        h = nn.relu(h)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="pw2")(h)


class ConformerLayer(nn.Module):
    """MHA → FFN → conv module, each post-norm residual
    (reference ``:69-114`` ordering)."""

    hidden_dim: int
    num_heads: int
    causal_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="mha")(x, x, mask)
        x = nn.LayerNorm(dtype=jnp.float32, name="attn_norm")(x + h).astype(self.dtype)
        f = nn.Dense(4 * self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ffn1")(x)
        f = nn.relu(f)
        f = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ffn2")(f)
        x = nn.LayerNorm(dtype=jnp.float32, name="ffn_norm")(x + f).astype(self.dtype)
        c = ConformerConvModule(self.hidden_dim, causal=self.causal_conv,
                                dtype=self.dtype, name="conv")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="conv_norm")(x + c).astype(self.dtype)
        return x


class ChunkedConformer(nn.Module):
    """Chunk-based Conformer encoder.

    ``__call__(x [B, T, input_dim], chunk_size?)``: when ``chunk_size``
    is set a chunked-causal attention mask is applied (each position
    attends within its chunk and all previous chunks); ``None`` = full
    attention (offline mode)."""

    input_dim: int = 80
    hidden_dim: int = 512
    num_layers: int = 12
    num_heads: int = 8
    chunk_size: int = 32
    max_len: int = 8192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        *,
        chunked: bool = False,
        attn_mask: Optional[Array] = None,
    ) -> Array:
        T = x.shape[1]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="input_proj")(x.astype(self.dtype))
        pos = sinusoidal_positions(self.max_len, self.hidden_dim)
        h = h + jnp.asarray(pos[:T])[None].astype(self.dtype)
        mask = attn_mask
        if mask is None and chunked:
            mask = chunk_mask(T, self.chunk_size)
        for i in range(self.num_layers):
            h = ConformerLayer(self.hidden_dim, self.num_heads,
                               causal_conv=chunked,
                               dtype=self.dtype, name=f"layer_{i}")(h, mask)
        return nn.Dense(self.hidden_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="output_proj")(h)
