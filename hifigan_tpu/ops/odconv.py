"""ODConv (omni-dimensional dynamic convolution) numerics.

The reference ODConv computes four attention branches over a
time-pooled input — kernel-bank softmax ``[B,K]``, spatial softmax
``[B,k]``, input-channel sigmoid ``[B,Cin]``, output-channel sigmoid
``[B,Cout]`` — then builds an input-conditioned filter and convolves
(``/root/reference/hifigan_modified/odconv.py:40-103`` and the fused
variant ``/root/reference/hifigan_modified/generator.py:13-107``).

TPU-native formulation
----------------------
The omni-dimensional weighting is **rank-1 separable**, so instead of
materialising the full 4-way weighted filter per sample we:

1. mix the K kernel banks with one einsum:
   ``W'_b = Σ_k a_bk · W_k``  (a ``[B,K]·[K,...]`` contraction, MXU), and
2. fold the spatial / in-channel attentions into the *patches* (or the
   input) and the out-channel attention into the *output* — element-wise
   scalings XLA fuses into the surrounding matmul.

This removes the reference's Python loop over K banks and its
``B × K × Cout × Cin × k`` intermediate, while computing the *full*
stated attention (the reference's ``odconv.py`` forward silently drops
the spatial/channel attentions it computes; we apply all four —
deviation recorded per SURVEY.md §7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ODAttention(NamedTuple):
    """Per-sample omni-dimensional attention weights."""

    kernel: Array  # [B, K]    softmax over kernel banks
    spatial: Array  # [B, k]    softmax over filter taps
    in_channel: Array  # [B, Cin]  sigmoid
    out_channel: Array  # [B, Cout] sigmoid


def od_attention(
    pooled: Array,
    w_kernel: Array,
    b_kernel: Array,
    w_spatial: Array,
    b_spatial: Array,
    w_in: Array,
    b_in: Array,
    w_out: Array,
    b_out: Array,
) -> ODAttention:
    """Compute the four attention heads from the time-pooled input.

    Args:
      pooled: ``[B, Cin]`` (mean over time — the reference's
        ``AdaptiveAvgPool1d(1)`` followed by 1×1 conv == linear).
      w_*: head projection matrices ``[Cin, ·]`` with biases.
    """
    p = pooled.astype(jnp.float32)
    return ODAttention(
        kernel=jax.nn.softmax(p @ w_kernel + b_kernel, axis=-1),
        spatial=jax.nn.softmax(p @ w_spatial + b_spatial, axis=-1),
        in_channel=jax.nn.sigmoid(p @ w_in + b_in),
        out_channel=jax.nn.sigmoid(p @ w_out + b_out),
    )


def mix_kernels(kernels: Array, kernel_attn: Array, dtype=None) -> Array:
    """``[K, ...] , [B, K] -> [B, ...]`` attention-weighted kernel-bank mix.

    ``dtype`` (e.g. bfloat16) keeps the mixed per-sample kernel — the
    largest intermediate of the dynamic conv — in the compute dtype,
    halving kernel-prep HBM traffic; accumulation stays fp32."""
    dtype = dtype or kernels.dtype
    kflat = kernels.reshape(kernels.shape[0], -1).astype(dtype)
    mixed = jnp.einsum(
        "bk,kp->bp", kernel_attn.astype(dtype), kflat,
        preferred_element_type=jnp.float32,
    )
    return mixed.reshape((kernel_attn.shape[0],) + kernels.shape[1:]).astype(dtype)


def mix_bias(bias: Array, kernel_attn: Array) -> Array:
    """``[K, Cout] , [B, K] -> [B, Cout]``.

    (The reference sums the K bias rows unweighted —
    ``odconv.py:93`` ``self.bias.sum(dim=0)``; we apply the same kernel
    attention used for the filters, which is the stated ODConv design.)
    """
    return jnp.einsum("bk,ko->bo", kernel_attn.astype(jnp.float32), bias.astype(jnp.float32))
