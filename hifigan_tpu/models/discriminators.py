"""MPD / MSD GAN discriminators, TPU-native.

Capability parity with ``/root/reference/hifigan_modified/discriminators.py``:

* **MPD** (periods 2,3,5,7,11): reshape wav ``[B,1,T]`` → ``[B,1,p,T/p]``
  (T padded to a multiple of p — static, since T is static under jit)
  and run a 5-layer 3×3 Conv2d stack 1→32→64→128→256→1 with
  LeakyReLU(0.1) (``discriminators.py:48-84``).
* **MSD** (scales 1,2,4): AvgPool1d downsample then a 5-layer k=15
  Conv1d stack 1→32→64→128→256→1 (``discriminators.py:86-117``).

Each sub-discriminator also returns its intermediate feature maps so a
true feature-matching loss is available (the reference computes FM only
on final outputs — ``complete_vocoder.py:117-124``; the loss layer keeps
that as the default for parity and exposes deep FM as an option).

Channels-last layouts throughout: ``[B, T, C]`` / ``[B, p, T/p, C]``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.ops import conv as conv_ops

Array = jax.Array

_STACK_CHANNELS = (32, 64, 128, 256, 1)


class PeriodDiscriminator(nn.Module):
    """One period head (reference ``Discriminator2D``)."""

    period: int
    leaky_slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: Array) -> Tuple[Array, List[Array]]:
        # wav: [B, T] → [B, p, T/p, 1] (channels-last 2-D image).
        # NB: the reference's ``view(B, C, period, T//period)``
        # (discriminators.py:79) splits time into ``period`` CONTIGUOUS
        # chunks — unlike canonical HiFi-GAN's periodic interleave
        # ``view(B, C, T//p, p)``. We match the reference exactly
        # (cross-tested in tests/test_reference_parity.py).
        B, T = wav.shape
        p = self.period
        if T % p:
            wav = jnp.pad(wav, ((0, 0), (0, p - T % p)))
            T = wav.shape[1]
        x = wav.reshape(B, p, T // p, 1).astype(self.dtype)
        feats: List[Array] = []
        ch_in = 1
        for i, ch_out in enumerate(_STACK_CHANNELS):
            w = self.param(
                f"conv_{i}_kernel", nn.initializers.normal(0.01),
                (3, 3, ch_in, ch_out), jnp.float32,
            )
            b = self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch_out,), jnp.float32)
            x = conv_ops.conv2d(x, w.astype(self.dtype), b, padding=1)
            if i < len(_STACK_CHANNELS) - 1:
                x = conv_ops.leaky_relu(x, self.leaky_slope)
                feats.append(x)
            ch_in = ch_out
        return x, feats


class ScaleDiscriminator(nn.Module):
    """One scale head (reference ``Discriminator1D``)."""

    scale: int
    leaky_slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: Array) -> Tuple[Array, List[Array]]:
        x = wav[:, :, None].astype(self.dtype)  # [B, T, 1]
        if self.scale > 1:
            x = conv_ops.avg_pool1d(x, self.scale, self.scale)
        feats: List[Array] = []
        ch_in = 1
        for i, ch_out in enumerate(_STACK_CHANNELS):
            w = self.param(
                f"conv_{i}_kernel", nn.initializers.normal(0.01),
                (15, ch_in, ch_out), jnp.float32,
            )
            b = self.param(f"conv_{i}_bias", nn.initializers.zeros, (ch_out,), jnp.float32)
            x = conv_ops.conv1d(x, w.astype(self.dtype), b, padding=7)
            if i < len(_STACK_CHANNELS) - 1:
                x = conv_ops.leaky_relu(x, self.leaky_slope)
                feats.append(x)
            ch_in = ch_out
        return x, feats


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: Array) -> Tuple[List[Array], List[List[Array]]]:
        outs, feats = [], []
        for p in self.periods:
            o, f = PeriodDiscriminator(p, dtype=self.dtype, name=f"period_{p}")(wav)
            outs.append(o)
            feats.append(f)
        return outs, feats


class MultiScaleDiscriminator(nn.Module):
    scales: Sequence[int] = (1, 2, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: Array) -> Tuple[List[Array], List[List[Array]]]:
        outs, feats = [], []
        for s in self.scales:
            o, f = ScaleDiscriminator(s, dtype=self.dtype, name=f"scale_{s}")(wav)
            outs.append(o)
            feats.append(f)
        return outs, feats


class Discriminators(nn.Module):
    """MPD + MSD ensemble (reference ``HiFiGANDiscriminators``).

    ``__call__(wav [B, 1, T] or [B, T])`` → dict with per-head final
    outputs and intermediate features."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    scales: Sequence[int] = (1, 2, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: Array) -> dict:
        if wav.ndim == 3:
            wav = wav[:, 0, :] if wav.shape[1] == 1 else wav[:, :, 0]
        mpd_out, mpd_feat = MultiPeriodDiscriminator(
            self.periods, dtype=self.dtype, name="mpd"
        )(wav)
        msd_out, msd_feat = MultiScaleDiscriminator(
            self.scales, dtype=self.dtype, name="msd"
        )(wav)
        return {
            "mpd_outputs": mpd_out,
            "mpd_features": mpd_feat,
            "msd_outputs": msd_out,
            "msd_features": msd_feat,
        }
