"""Shared neural building blocks: attention, transformer encoder layers,
positional encodings.  Used by the Emotion2Vec encoder, the chunked
Conformer, and the simultaneous text decoder."""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Standard sinusoidal positional encoding table ``[length, dim]``."""
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    table = np.zeros((length, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table


class MultiHeadAttention(nn.Module):
    """Multi-head attention with optional additive mask.

    mask: broadcastable to ``[B, heads, Tq, Tk]``; True = attend."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q_in: Array,
        kv_in: Array,
        mask: Optional[Array] = None,
    ) -> Array:
        d = q_in.shape[-1]
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads
        dense = lambda name: nn.DenseGeneral(
            (self.num_heads, head_dim), dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        q = dense("q")(q_in)
        k = dense("k")(kv_in)
        v = dense("v")(kv_in)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(head_dim)
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return nn.DenseGeneral(d, axis=(-2, -1), dtype=self.dtype,
                               param_dtype=jnp.float32, name="out")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch ``nn.TransformerEncoderLayer``
    semantics, as used by the reference's Emotion2Vec —
    /root/reference/embedding_extractors.py:187-195)."""

    num_heads: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="mha")(x, x, mask)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + h).astype(self.dtype)
        f = nn.Dense(self.ffn_dim, dtype=self.dtype, param_dtype=jnp.float32, name="ffn1")(x)
        f = nn.relu(f)
        f = nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32, name="ffn2")(f)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + f).astype(self.dtype)
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer: causal self-attn + cross-attn + FFN
    (torch ``nn.TransformerDecoderLayer`` semantics — used by the
    reference's SimultaneousTextDecoder,
    /root/reference/streamspeech_integration.py:200-252)."""

    num_heads: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        memory: Array,
        self_mask: Optional[Array] = None,
        cross_mask: Optional[Array] = None,
    ) -> Array:
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="self_mha")(x, x, self_mask)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + h).astype(self.dtype)
        h = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="cross_mha")(
            x, memory, cross_mask
        )
        x = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + h).astype(self.dtype)
        f = nn.Dense(self.ffn_dim, dtype=self.dtype, param_dtype=jnp.float32, name="ffn1")(x)
        f = nn.relu(f)
        f = nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32, name="ffn2")(f)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x + f).astype(self.dtype)
        return x


def causal_mask(length: int) -> Array:
    """``[1, 1, T, T]`` lower-triangular attention mask (True = attend)."""
    return jnp.tril(jnp.ones((length, length), dtype=bool))[None, None]


def chunk_mask(length: int, chunk_size: int) -> Array:
    """Chunked-attention mask: position i attends to all positions in
    chunks up to and including its own chunk (streaming Conformer —
    reference /root/reference/streamspeech_integration.py:43-66)."""
    idx = jnp.arange(length)
    blocks = idx // chunk_size
    return (blocks[None, :] <= blocks[:, None])[None, None]
