"""GRC-LoRA numerics: grouped residual conv with a shared low-rank path.

The reference's generator-internal GRC block
(``/root/reference/hifigan_modified/generator.py:109-172``) runs a
grouped dilated conv plus, **per group in a Python loop**, the low-rank
update ``(x_gᵀ · Aᵀ) · Bᵀ`` with ``A:[r, C/G]``, ``B:[C/G, r]`` *shared
across groups*, then a 1×1 channel mixer, GroupNorm, LeakyReLU and a
residual add.

TPU-native formulation: the block-diagonal-with-shared-block LoRA
operator is a single pair of einsums over a ``[B, T, G, C/G]`` view —
two rank-r matmuls on the MXU, no group loop:

    h = einsum('btgc,cr->btgr', x, Aᵀ) ; lora = einsum('btgr,rc->btgc', h, Bᵀ)

The standalone variant (``/root/reference/hifigan_modified/grc_lora.py:5-68``)
computes ``x·(A·B)`` over *all* channels; that is the ``groups=1`` case of
the same routine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grouped_lora(x: Array, lora_a: Array, lora_b: Array, groups: int) -> Array:
    """Shared-block block-diagonal low-rank update.

    Args:
      x: ``[B, T, C]``.
      lora_a: ``[r, C // groups]``  (reference ``lora_A``).
      lora_b: ``[C // groups, r]``  (reference ``lora_B``).
    Returns:
      ``[B, T, C]`` low-rank update (un-scaled).
    """
    B, T, C = x.shape
    g = groups
    xg = x.reshape(B, T, g, C // g).astype(jnp.float32)
    # reference: (x_g^T @ A^T) @ B^T  with A:[r, C/g], B:[C/g, r]
    h = jnp.einsum("btgc,rc->btgr", xg, lora_a.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("btgr,cr->btgc", h, lora_b.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return y.reshape(B, T, C).astype(x.dtype)


def group_norm(x: Array, gamma: Array, beta: Array, groups: int, eps: float = 1e-5) -> Array:
    """GroupNorm over ``[B, T, C]`` (normalise per (batch, group) over T and
    the group's channels — torch ``nn.GroupNorm`` semantics)."""
    B, T, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, T, groups, C // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(B, T, C)
    return (xn * gamma + beta).astype(x.dtype)
