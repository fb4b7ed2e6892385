"""GRC-LoRA numerics: grouped residual conv with a shared low-rank path.

The reference's generator-internal GRC block
(``/root/reference/hifigan_modified/generator.py:109-172``) runs a
grouped dilated conv plus, **per group in a Python loop**, the low-rank
update ``(x_gᵀ · Aᵀ) · Bᵀ`` with ``A:[r, C/G]``, ``B:[C/G, r]`` *shared
across groups*, then a 1×1 channel mixer, GroupNorm, LeakyReLU and a
residual add.

TPU-native formulation — layout is everything here.  These blocks run at
the **audio rate** (256× the mel rate) with only 32 channels, so any
reshape that puts ``C/G = 8`` into the lane dimension destroys tiling
(measured ~30× slowdown).  Every op below therefore stays in
``[B, T, C]`` with C in lanes:

* the block-diagonal-with-shared-block LoRA operator is materialised
  once per call as a dense ``[C, C]`` matrix (``blockdiag(B·A)`` — a
  trace-time constant-shaped op on tiny tensors), so the LoRA path is a
  single ``[B,T,C] @ [C,C]`` matmul;
* the grouped conv is run as a dense conv whose kernel is the grouped
  kernel scattered into a block-diagonal ``[k, C, C]`` (zeros across
  groups) — identical math, full-width lanes;
* GroupNorm statistics are computed by reducing over T into ``[B, C]``
  (layout-friendly) and then aggregating channels-per-group with a tiny
  0/1 matmul, never reshaping the activation tensor.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@lru_cache(maxsize=None)
def _group_matrix(channels: int, groups: int) -> np.ndarray:
    """0/1 membership matrix ``[C, G]``: M[c, g] = 1 iff c ∈ group g."""
    m = np.zeros((channels, groups), dtype=np.float32)
    per = channels // groups
    for g in range(groups):
        m[g * per : (g + 1) * per, g] = 1.0
    return m


def lora_block_matrix(lora_a: Array, lora_b: Array, groups: int) -> Array:
    """Build the dense ``[C, C]`` operator equivalent to the per-group
    shared low-rank update ``x_g ↦ (x_g Aᵀ) Bᵀ``.

    Args:
      lora_a: ``[r, C // groups]``; lora_b: ``[C // groups, r]``.
    Returns:
      ``[C, C]`` block-diagonal matrix with each block = ``Aᵀ·Bᵀ``.
    """
    block = (lora_a.T @ lora_b.T).astype(jnp.float32)  # [C/g, C/g]
    cg = block.shape[0]
    c = cg * groups
    eye = jnp.eye(groups, dtype=jnp.float32)
    # [g, C/g, g, C/g] -> [C, C]
    return (eye[:, None, :, None] * block[None, :, None, :]).reshape(c, c)


def grouped_lora(x: Array, lora_a: Array, lora_b: Array, groups: int) -> Array:
    """Shared-block block-diagonal low-rank update as ONE matmul.

    Args:
      x: ``[B, T, C]``; lora_a ``[r, C//groups]``; lora_b ``[C//groups, r]``.
    """
    w = lora_block_matrix(lora_a, lora_b, groups)
    return jnp.einsum(
        "btc,cd->btd", x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def blockdiag_conv_kernel(w: Array, groups: int) -> Array:
    """Scatter a grouped conv kernel ``[k, C//G, C]`` (WIO, grouped) into
    the equivalent dense ``[k, C, C]`` block-diagonal kernel."""
    k, cg, c = w.shape
    per_out = c // groups
    mask = jnp.asarray(_group_matrix(c, groups))  # [C, G]
    # dense[k, ci, co] = w[k, ci % cg, co] iff ci in group(co)
    w_full = jnp.tile(w, (1, groups, 1))  # [k, C, C] (wrong cross-group entries)
    co_group = jnp.repeat(jnp.arange(groups), per_out)  # [C]
    ci_group = jnp.repeat(jnp.arange(groups), cg)  # [C]
    keep = (ci_group[:, None] == co_group[None, :]).astype(w.dtype)  # [C, C]
    return w_full * keep[None]


def group_norm(x: Array, gamma: Array, beta: Array, groups: int, eps: float = 1e-5) -> Array:
    """GroupNorm over ``[B, T, C]`` (torch ``nn.GroupNorm`` semantics:
    normalise per (batch, group) over T and the group's channels) —
    computed without ever leaving the ``[B, T, C]`` layout."""
    B, T, C = x.shape
    xf = x.astype(jnp.float32)
    m = jnp.asarray(_group_matrix(C, groups))  # [C, G]
    n = T * (C // groups)
    s1 = jnp.sum(xf, axis=1) @ m  # [B, G]
    s2 = jnp.sum(jnp.square(xf), axis=1) @ m  # [B, G]
    mean_g = s1 / n
    var_g = s2 / n - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)  # [B, G]
    mean_c = mean_g @ m.T  # [B, C]
    inv_c = inv_g @ m.T
    y = (xf - mean_c[:, None, :]) * inv_c[:, None, :]
    return (y * gamma + beta).astype(x.dtype)
