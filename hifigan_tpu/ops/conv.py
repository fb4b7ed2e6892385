"""Convolution primitives, TPU-first.

Two families:

* **Static-weight** convs (``conv1d`` / ``conv_transpose1d`` / ``conv2d``)
  are thin wrappers over :func:`jax.lax.conv_general_dilated` in
  channels-last layout so XLA tiles them straight onto the MXU.

* **Dynamic per-sample-weight** convs (``dynamic_conv1d`` /
  ``dynamic_conv_transpose1d``) are the TPU-native replacement for the
  reference's ODConv forward (which loops over K kernel banks in Python
  and calls ``F.conv1d`` per bank — ``/root/reference/hifigan_modified/
  odconv.py:89-103``).  XLA convolutions require *static* filters, so a
  per-sample filter cannot use the conv HLO directly.  Instead we express
  the conv as a **batched matmul**:

  - forward conv:  gather k static strided slices of the padded input
    (``extract_patches_1d``) and contract patches ``[B,T,k,Cin]`` with
    per-sample kernels ``[B,k,Cin,Cout]`` in one einsum → MXU.
  - transposed conv (the generator's upsampler): one einsum
    ``[B,T,Cin] x [B,Cin,Cout,k] -> [B,T,Cout,k]`` followed by a static
    **overlap-add** with hop = stride.  For the generator's kernels
    (k = 2·f, stride f, pad f//2 — ``/root/reference/hifigan_modified/
    generator.py:226-234``) the overlap-add is exactly two shifted adds.

  Both are single large contractions with static shapes — no Python
  loops over kernel banks or groups survive into the compiled program.

Layouts
-------
activations ``[B, T, C]`` (channels-last: lane dim = channels),
1-D filters ``[k, Cin, Cout]`` ("WIO"), transposed filters
``[Cin, Cout, k]``, dynamic filters carry a leading batch dim.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _same_pad(kernel_size: int, dilation: int = 1) -> int:
    """Reference-style symmetric padding: (k-1)*d // 2."""
    return (kernel_size - 1) * dilation // 2


def conv1d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int = 1,
    padding: int | str = "SAME",
    dilation: int = 1,
    groups: int = 1,
) -> Array:
    """1-D convolution, channels-last.

    Args:
      x: ``[B, T, Cin]``.
      w: ``[k, Cin // groups, Cout]``.
      b: optional ``[Cout]``.
      padding: int (symmetric), (lo, hi) tuple, or "SAME"/"VALID".
    Returns:
      ``[B, T_out, Cout]``.
    """
    if isinstance(padding, int):
        pad: Sequence[tuple[int, int]] | str = [(padding, padding)]
    elif isinstance(padding, tuple):
        pad = [padding]
    else:
        pad = padding
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv2d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    strides: tuple[int, int] = (1, 1),
    padding: int | tuple[int, int] | str = "SAME",
) -> Array:
    """2-D convolution, channels-last ``[B, H, W, Cin]`` with ``[kh, kw, Cin, Cout]``."""
    if isinstance(padding, int):
        pad: Sequence[tuple[int, int]] | str = [(padding, padding), (padding, padding)]
    elif isinstance(padding, tuple):
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        pad = padding
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv_transpose1d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int,
    padding: int = 0,
) -> Array:
    """Static-weight 1-D transposed conv (channels-last).

    Args:
      x: ``[B, T, Cin]``.
      w: ``[Cin, Cout, k]`` (torch ``conv_transpose1d`` layout).
    Returns:
      ``[B, (T-1)*stride - 2*padding + k, Cout]``.
    """
    # Route through the same overlap-add path as the dynamic version so a
    # single well-tiled code path serves both; XLA folds the broadcast.
    z = jnp.einsum("bti,iok->btok", x, w, preferred_element_type=jnp.float32)
    return _overlap_add(z, stride, padding, b, x.dtype)


def extract_patches_1d(
    x: Array,
    kernel_size: int,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> Array:
    """Im2col for 1-D convs via ``kernel_size`` static strided slices.

    Args:
      x: ``[B, T, C]``.
    Returns:
      ``[B, T_out, kernel_size, C]`` where
      ``T_out = (T + 2*padding - dilation*(kernel_size-1) - 1) // stride + 1``.
    """
    B, T, C = x.shape
    t_eff = T + 2 * padding
    t_out = (t_eff - dilation * (kernel_size - 1) - 1) // stride + 1
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    taps = []
    for i in range(kernel_size):
        start = i * dilation
        taps.append(lax.slice(
            x, (0, start, 0), (B, start + (t_out - 1) * stride + 1, C), (1, stride, 1)
        ))
    return jnp.stack(taps, axis=2)


def dynamic_conv1d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> Array:
    """Per-sample-filter 1-D conv as a batched patch matmul.

    Args:
      x: ``[B, T, Cin]``.
      w: ``[B, k, Cin, Cout]`` per-sample filters.
      b: optional ``[B, Cout]`` or ``[Cout]``.
    Returns:
      ``[B, T_out, Cout]``.
    """
    k = w.shape[1]
    patches = extract_patches_1d(x, k, stride=stride, padding=padding, dilation=dilation)
    y = jnp.einsum("btki,bkio->bto", patches, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + (b[:, None, :] if b.ndim == 2 else b)
    return y.astype(x.dtype)


def _overlap_add(
    z: Array,
    stride: int,
    padding: int,
    b: Array | None,
    out_dtype,
) -> Array:
    """Overlap-add of per-frame tap responses ``z [B, T, Cout, k]`` with hop
    ``stride``: ``y[m] = sum_{t,j : t*stride + j == m + padding} z[t, :, j]``.

    This realises transposed convolution output
    ``L_out = (T-1)*stride + k - 2*padding`` without any scatter: the tap
    axis is split into ``ceil(k/stride)`` stride-sized groups, each of
    which reshapes to a contiguous signal and is added at a static offset.
    """
    B, T, O, k = z.shape
    f = stride
    n = -(-k // f)  # ceil
    if k % f:
        z = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (0, n * f - k)))
    full_len = T * f + (n - 1) * f
    l_out = (T - 1) * f + k - 2 * padding
    # z -> [B, T, n, f, O] -> per-group contiguous [B, T*f, O] at offset j*f
    zg = z.reshape(B, T, O, n, f).transpose(0, 1, 3, 4, 2)  # [B, T, n, f, O]
    y = jnp.zeros((B, full_len, O), dtype=z.dtype)
    for j in range(n):
        sig = zg[:, :, j].reshape(B, T * f, O)
        pad_front = j * f
        pad_back = full_len - T * f - pad_front
        y = y + jnp.pad(sig, ((0, 0), (pad_front, pad_back), (0, 0)))
    y = lax.slice(y, (0, padding, 0), (B, padding + l_out, O))
    if b is not None:
        y = y + (b[:, None, :] if b.ndim == 2 else b)
    return y.astype(out_dtype)


def dynamic_conv_transpose1d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int,
    padding: int = 0,
) -> Array:
    """Per-sample-filter transposed 1-D conv (the ODConv upsampler).

    Args:
      x: ``[B, T, Cin]``.
      w: ``[B, Cin, Cout, k]`` per-sample filters.
      b: optional ``[B, Cout]`` or ``[Cout]``.
    Returns:
      ``[B, (T-1)*stride + k - 2*padding, Cout]``.
    """
    z = jnp.einsum("bti,biok->btok", x, w, preferred_element_type=jnp.float32)
    return _overlap_add(z, stride, padding, b, x.dtype)


def conv1d_via_matmul(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    padding: int = 0,
    dilation: int = 1,
) -> Array:
    """Static-weight 1-D conv expressed as an im2col matmul.

    For audio-rate layers with few channels (C ≪ 128 lanes) the conv HLO
    tiles poorly; contracting over ``k·C`` (≥ 96) instead keeps the MXU
    busy.  Args: x ``[B, T, Cin]``, w ``[k, Cin, Cout]``.
    """
    k = w.shape[0]
    patches = extract_patches_1d(x, k, stride=1, padding=padding, dilation=dilation)
    y = jnp.einsum(
        "btki,kio->bto", patches, w.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def avg_pool1d(x: Array, window: int, stride: int | None = None) -> Array:
    """Average pool over time, channels-last ``[B, T, C]`` (torch ``AvgPool1d``
    semantics: VALID padding, count includes full window)."""
    stride = stride or window
    y = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )
    return (y / window).astype(x.dtype)


def leaky_relu(x: Array, negative_slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, negative_slope * x)
