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
  - transposed conv (the generator's upsampler): a **polyphase**
    decomposition — the op becomes one batched matmul
    ``[B,T,|D|·Cin] @ [B,|D|·Cin, f·Cout]`` over a handful of shifted
    input copies, whose output lands directly in time-folded layout
    (see ``_polyphase_kernel`` / ``folded_polyphase_kernel``).  For the
    generator's kernels (k = 2·f, stride f, pad f//2 —
    ``/root/reference/hifigan_modified/generator.py:226-234``) |D| = 2.

  Both are single large contractions with static shapes — no Python
  loops over kernel banks or groups survive into the compiled program.

Layouts
-------
activations ``[B, T, C]`` (channels-last: lane dim = channels),
1-D filters ``[k, Cin, Cout]`` ("WIO"), transposed filters
``[Cin, Cout, k]``, dynamic filters carry a leading batch dim.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
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
    # NB: no preferred_element_type here — conv_general_dilated's
    # gradient transpose mismatches dtypes under bf16 when the output is
    # promoted (fp32 cotangent vs bf16 kernel); the MXU accumulates
    # bf16 convs in fp32 internally regardless.
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
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
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def _polyphase_shifts(k: int, stride: int, padding: int) -> list[int]:
    """Input-block shifts d such that tap ``j = d*stride + r + padding``
    is in range for some output phase ``r ∈ [0, stride)``."""
    lo = -((stride - 1 + padding) // stride)
    hi = (k - 1 - padding) // stride
    return list(range(lo, hi + 1))


def _polyphase_kernel(w_iok: Array, stride: int, padding: int) -> Array:
    """Rearrange a transposed-conv kernel ``[..., Cin, Cout, k]`` into the
    polyphase matmul operator ``[..., |D|·Cin, stride·Cout]``:

        y[u·f + r, o] = Σ_d Σ_i x[u − d, i] · Wd[i, (r, o)]
        with tap j = d·f + r + padding (zero outside [0, k)).

    The transform is a trace-time gather on the (tiny) kernel tensor;
    out-of-range taps are masked to zero.
    """
    f = stride
    k = w_iok.shape[-1]
    D = _polyphase_shifts(k, f, padding)
    d_arr = np.asarray(D)[:, None]  # [|D|, 1]
    r_arr = np.arange(f)[None, :]  # [1, f]
    j = d_arr * f + r_arr + padding  # [|D|, f]
    valid = (j >= 0) & (j < k)
    j_safe = np.clip(j, 0, k - 1)
    # [..., Cin, Cout, |D|, f]
    wt = jnp.take(w_iok, jnp.asarray(j_safe.reshape(-1)), axis=-1)
    wt = wt.reshape(w_iok.shape[:-1] + (len(D), f))
    wt = wt * jnp.asarray(valid, dtype=wt.dtype)
    # -> [..., |D|, Cin, f, Cout] -> [..., |D|*Cin, f*Cout]
    perm = list(range(wt.ndim - 4)) + [wt.ndim - 2, wt.ndim - 4, wt.ndim - 1, wt.ndim - 3]
    wt = wt.transpose(perm)
    lead = wt.shape[:-4]
    nd, cin, ff, cout = wt.shape[-4:]
    return wt.reshape(lead + (nd * cin, ff * cout))


def _polyphase_apply(
    x: Array, w_poly: Array, shifts: list[int], stride: int, padding: int,
    k: int, b: Array | None, out_dtype,
) -> Array:
    """Shared polyphase executor: stack shifted inputs, one matmul, crop.

    ``w_poly``: ``[|D|·Cin, f·Cout]`` (static) or ``[B, |D|·Cin, f·Cout]``.
    """
    B, T, Cin = x.shape
    f = stride
    l_out = (T - 1) * f + k - 2 * padding
    U = -(-l_out // f)  # output blocks (may exceed T for k > 2*padding + f)
    stacked = []
    for d in shifts:
        # xs[u] = x[u - d] over u ∈ [0, U), zero outside [0, T)
        L = max(d, 0)
        R = max(0, U - d - T)
        x_ext = jnp.pad(x, ((0, 0), (L, R), (0, 0))) if (L or R) else x
        xs = lax.slice(x_ext, (0, L - d, 0), (B, L - d + U, Cin))
        stacked.append(xs)
    xcat = jnp.concatenate(stacked, axis=-1)  # [B, U, |D|*Cin]
    if w_poly.ndim == 2:
        y = jnp.einsum("btp,pq->btq", xcat, w_poly.astype(x.dtype),
                       preferred_element_type=jnp.float32)
    else:
        y = jnp.einsum("btp,bpq->btq", xcat, w_poly.astype(x.dtype),
                       preferred_element_type=jnp.float32)
    fo = y.shape[-1] // f
    y = y.reshape(B, U * f, fo)  # phase-major within each block == time order
    y = lax.slice(y, (0, 0, 0), (B, l_out, fo))
    if b is not None:
        y = y + (b[:, None, :] if b.ndim == 2 else b)
    return y.astype(out_dtype)


def conv_transpose1d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int,
    padding: int = 0,
) -> Array:
    """Static-weight 1-D transposed conv (channels-last), polyphase.

    Transposed convolution decomposes into ``stride`` phase-wise stride-1
    convs; stacking the (few) shifted input copies turns the whole op
    into ONE matmul ``[B,T,|D|·Cin] @ [|D|·Cin, stride·Cout]`` whose
    output is already in time-major folded layout — no scatter, no
    ``[B,T,Cout,k]`` intermediate (which tiles catastrophically for the
    generator's late stages where Cout·k is small).

    Args:
      x: ``[B, T, Cin]``; w: ``[Cin, Cout, k]`` (torch layout).
    Returns:
      ``[B, (T-1)*stride - 2*padding + k, Cout]``.
    """
    shifts = _polyphase_shifts(w.shape[-1], stride, padding)
    w_poly = _polyphase_kernel(w, stride, padding)
    return _polyphase_apply(x, w_poly, shifts, stride, padding, w.shape[-1], b, x.dtype)


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


def dynamic_conv_transpose1d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int,
    padding: int = 0,
) -> Array:
    """Per-sample-filter transposed 1-D conv (the ODConv upsampler) —
    polyphase batched matmul (see :func:`conv_transpose1d`).

    Args:
      x: ``[B, T, Cin]``.
      w: ``[B, Cin, Cout, k]`` per-sample filters.
      b: optional ``[B, Cout]`` or ``[Cout]``.
    Returns:
      ``[B, (T-1)*stride + k - 2*padding, Cout]``.
    """
    shifts = _polyphase_shifts(w.shape[-1], stride, padding)
    w_poly = _polyphase_kernel(w, stride, padding)  # [B, |D|*Cin, f*Cout]
    return _polyphase_apply(x, w_poly, shifts, stride, padding, w.shape[-1], b, x.dtype)


def folded_polyphase_kernel(
    w_iok: Array, stride: int, padding: int, fold_in: int
) -> tuple[Array, list[int]]:
    """Polyphase transposed-conv operator for **time-folded** input/output.

    Input lanes pack ``fold_in`` consecutive time steps
    (``X[v, q·Cin + i] = x[v·Fin + q, i]``); the output packs
    ``fold_in · stride`` steps (``Y[v, (c·f + r)·Cout + o] =
    y[(v·Fin + c)·f + r, o]``).  The composite map is a conv over folded
    blocks with shifts δ and operator

        W'_δ[(q, i), (c, r, o)] = W[i, o, j],
        j = (c − δ·Fin − q)·f + r + padding   (zero outside [0, k)).

    Keeping the generator's late upsampling stages folded holds the lane
    dimension at 128 all the way to the waveform (the unfolded layouts
    run at <10% HBM efficiency — see ops/fold.py).

    Returns (W' ``[..., |Δ|·Fin·Cin, Fin·f·Cout]``, shifts Δ).
    """
    f = stride
    k = w_iok.shape[-1]
    fin = fold_in
    # valid δ: j in range for some (q, c, r)
    deltas = []
    for delta in range(-k // (f * fin) - 2, k // (f * fin) + 3):
        js = (np.arange(fin)[:, None, None] - delta * fin
              - np.arange(fin)[None, :, None]) * f + np.arange(f)[None, None, :] + padding
        # js indexed [c, q, r]
        if ((js >= 0) & (js < k)).any():
            deltas.append(delta)
    c_arr = np.arange(fin)[:, None, None]
    q_arr = np.arange(fin)[None, :, None]
    r_arr = np.arange(f)[None, None, :]
    blocks = []
    for delta in deltas:
        j = (c_arr - delta * fin - q_arr) * f + r_arr + padding  # [c, q, r]
        valid = (j >= 0) & (j < k)
        j_safe = np.clip(j, 0, k - 1)
        wt = jnp.take(w_iok, jnp.asarray(j_safe.reshape(-1)), axis=-1)
        wt = wt.reshape(w_iok.shape[:-1] + (fin, fin, f))  # [..., I, O, c, q, r]
        wt = wt * jnp.asarray(valid, dtype=wt.dtype)
        # -> [..., q, I, c, r, O]
        nd = wt.ndim
        perm = list(range(nd - 5)) + [nd - 2, nd - 5, nd - 3, nd - 1, nd - 4]
        wt = wt.transpose(perm)
        lead = wt.shape[:-5]
        q_, i_, c_, r_, o_ = wt.shape[-5:]
        blocks.append(wt.reshape(lead + (q_ * i_, c_ * r_ * o_)))
    return jnp.concatenate(blocks, axis=-2), deltas


def folded_tap_map(
    k: int, stride: int, padding: int, fold_in: int
) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Tap-index map of the folded polyphase operator.

    Each entry of the folded kernel ``[|Δ|·Fin·Cin, Fin·f·Cout]``
    corresponds to one original tap τ (independent of the channel
    indices): ``τ(δ, q, c, r) = (c − δ·Fin − q)·f + r + padding``.
    Returns (tap ``[|Δ|·Fin, Fin·f]``, valid mask, shifts Δ) — used to
    apply per-sample *spatial* (tap) attention directly in polyphase
    space without re-deriving the kernel per batch element.
    """
    f = stride
    fin = fold_in
    deltas = []
    for delta in range(-k // (f * fin) - 2, k // (f * fin) + 3):
        js = (np.arange(fin)[:, None, None] - delta * fin
              - np.arange(fin)[None, :, None]) * f + np.arange(f)[None, None, :] + padding
        if ((js >= 0) & (js < k)).any():
            deltas.append(delta)
    tap = np.zeros((len(deltas) * fin, fin * f), np.int64)
    valid = np.zeros_like(tap, dtype=bool)
    for di, delta in enumerate(deltas):
        for q in range(fin):
            for c in range(fin):
                for r in range(f):
                    j = (c - delta * fin - q) * f + r + padding
                    if 0 <= j < k:
                        tap[di * fin + q, c * f + r] = j
                        valid[di * fin + q, c * f + r] = True
    return tap, valid, deltas


def folded_polyphase_apply(
    x_folded: Array,
    w_poly: Array,
    deltas: list[int],
    b: Array | None = None,
    *,
    stride: int,
    fold_in: int,
) -> Array:
    """Apply a prebuilt folded polyphase operator.

    Args:
      x_folded: ``[B, U, Fin·Cin]``;
      w_poly: ``[B, |Δ|·Fin·Cin, Fin·f·Cout]`` (or unbatched 2-D).
    """
    B, U, FC = x_folded.shape
    stacked = []
    for d in deltas:
        # xs[u] = X[u + d] (zero beyond the sequence)
        if d > 0:
            xs = jnp.pad(x_folded, ((0, 0), (0, d), (0, 0)))[:, d:]
        elif d < 0:
            xs = jnp.pad(x_folded, ((0, 0), (-d, 0), (0, 0)))[:, :U]
        else:
            xs = x_folded
        stacked.append(xs)
    xcat = jnp.concatenate(stacked, axis=-1)
    eq = "bup,bpq->buq" if w_poly.ndim == 3 else "bup,pq->buq"
    y = jnp.einsum(eq, xcat, w_poly.astype(x_folded.dtype),
                   preferred_element_type=jnp.float32)
    if b is not None:
        fout = fold_in * stride
        bb = jnp.tile(b, (1, fout) if b.ndim == 2 else (fout,))
        y = y + (bb[:, None, :] if b.ndim == 2 else bb)
    return y.astype(x_folded.dtype)


def folded_dynamic_conv_transpose1d(
    x_folded: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int,
    padding: int,
    fold_in: int,
) -> Array:
    """Per-sample transposed conv on folded activations.

    Args:
      x_folded: ``[B, U, fold_in·Cin]``; w ``[B, Cin, Cout, k]``.
      Requires exact-length upsampling (k = 2·padding + stride, as in
      all generator stages) so no output cropping is needed.
    Returns:
      ``[B, U, fold_in·stride·Cout]`` (natural output fold).
    """
    k = w.shape[-1]
    assert k == 2 * padding + stride, (
        "folded path requires exact-length upsampling (k = 2p + f); "
        f"got k={k}, p={padding}, f={stride}"
    )
    w_poly, deltas = folded_polyphase_kernel(w, stride, padding, fold_in)
    return folded_polyphase_apply(
        x_folded, w_poly, deltas, b, stride=stride, fold_in=fold_in
    )


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
