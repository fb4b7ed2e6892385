"""Standalone building blocks from the reference's ``grc_lora.py`` module.

These are the *standalone* variants — behaviourally distinct from the
generator-internal ones (SURVEY.md §2.1 rows 3 and 6):

* :class:`StandaloneGRCBlock` —
  ``/root/reference/hifigan_modified/grc_lora.py:5-68``: grouped conv
  (groups = min(in, out, 4)) ⊕ scaled whole-channel LoRA ``x·(A·B)`` →
  1×1 projection → GroupNorm → **SiLU** → residual (with a 1×1
  projection when channels change).  The reference creates that
  residual projection lazily *inside forward* — a latent bug (never
  registered with the optimizer/device); here it is a proper parameter.
* :class:`ParallelMRFBlock` —
  ``grc_lora.py:131-163``: parallel GRC branches at dilations (1, 3, 5)
  over a channel split, concat → 1×1 fusion → GroupNorm → dropout →
  residual.  (The generator itself applies GRC blocks *sequentially* —
  ``generator.py:290-297`` — which :class:`~hifigan_tpu.models.generator.Generator`
  mirrors; this parallel block is the standalone capability.)
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.ops import conv as conv_ops
from hifigan_tpu.ops import grc_lora as lora_ops

Array = jax.Array


class StandaloneGRCBlock(nn.Module):
    """Grouped conv + whole-channel LoRA + 1×1 proj + GroupNorm + SiLU
    + (projected) residual."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    lora_rank: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin, cout = self.in_channels, self.out_channels
        g = min(cin, cout, 4)
        x = x.astype(self.dtype)
        residual = x
        pad = (self.kernel_size - 1) * self.dilation // 2
        wg = self.param("grouped_kernel", nn.initializers.normal(0.02),
                        (self.kernel_size, cin // g, cout), jnp.float32)
        bg = self.param("grouped_bias", nn.initializers.zeros, (cout,), jnp.float32)
        h = conv_ops.conv1d(x, wg.astype(self.dtype), bg,
                            padding=pad, dilation=self.dilation, groups=g)
        # whole-channel LoRA: x @ (A·B), scaled (grc_lora.py:24-28, 45-52)
        lora_a = self.param("lora_A", nn.initializers.normal(0.02),
                            (cin, self.lora_rank), jnp.float32)
        lora_b = self.param("lora_B", nn.initializers.zeros,
                            (self.lora_rank, cout), jnp.float32)
        scaling = self.param("lora_scaling", nn.initializers.ones, (1,), jnp.float32)
        lora = jnp.einsum("btc,cd->btd", x.astype(jnp.float32), lora_a @ lora_b,
                          preferred_element_type=jnp.float32)
        h = (h + scaling * lora).astype(self.dtype)
        wp = self.param("proj_kernel", nn.initializers.normal(0.02),
                        (1, cout, cout), jnp.float32)
        bp = self.param("proj_bias", nn.initializers.zeros, (cout,), jnp.float32)
        h = conv_ops.conv1d(h, wp.astype(self.dtype), bp, padding=0)
        gamma = self.param("norm_gamma", nn.initializers.ones, (cout,), jnp.float32)
        beta = self.param("norm_beta", nn.initializers.zeros, (cout,), jnp.float32)
        norm_groups = min(8, cout // 4) if cout >= 4 else 1  # reference :28-29
        h = lora_ops.group_norm(h, gamma, beta, norm_groups)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        if cin != cout:
            wr = self.param("residual_proj", nn.initializers.normal(0.02),
                            (1, cin, cout), jnp.float32)
            residual = conv_ops.conv1d(residual, wr.astype(self.dtype), padding=0)
        return h + residual


class ParallelMRFBlock(nn.Module):
    """Channel-split parallel multi-receptive-field block."""

    channels: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    kernel_size: int = 3
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        c = self.channels
        n = len(self.dilations)
        split = c // n
        x = x.astype(self.dtype)
        residual = x
        outs = []
        for i, d in enumerate(self.dilations):
            cin = split if i < n - 1 else c - split * (n - 1)
            piece = x[..., i * split : i * split + cin]
            outs.append(StandaloneGRCBlock(
                in_channels=cin, out_channels=cin,
                kernel_size=self.kernel_size, dilation=d,
                dtype=self.dtype, name=f"grc_d{d}",
            )(piece))
        h = jnp.concatenate(outs, axis=-1)
        wf = self.param("fusion_kernel", nn.initializers.normal(0.02),
                        (1, c, c), jnp.float32)
        bf = self.param("fusion_bias", nn.initializers.zeros, (c,), jnp.float32)
        h = conv_ops.conv1d(h, wf.astype(self.dtype), bf, padding=0)
        gamma = self.param("norm_gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("norm_beta", nn.initializers.zeros, (c,), jnp.float32)
        h = lora_ops.group_norm(h, gamma, beta, min(4, c))
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return h + residual
