"""Fused GRC-chain Pallas kernel.

The generator's MRF section is a chain of GRC-LoRA blocks at the audio
rate.  After the algebraic fusion in :class:`GRCLoRABlock` each block is

    pre_{i+1}(t) = Σ_j y_i(t + j − lo) · W2[j] + bias + y_i(t)
    y_i(t)       = leaky(γ·(pre_i(t) − μ_i)·inv_i + β)        (GroupNorm)

i.e. an elementwise normalisation followed by a short conv with
128×128 taps (folded layout).  XLA executes this as ≥4 HBM passes per
block (normalise write, conv read, conv write, stats read).  This kernel
performs **one pass per block**: each grid step DMAs a haloed window of
``pre_i`` from HBM, normalises it in VMEM, runs the tap matmuls on the
MXU, adds the residual, writes the ``pre_{i+1}`` tile, and accumulates
the Σx / Σx² lane sums the *next* block's GroupNorm needs (TPU grids
execute sequentially, so revisiting the stats block across time-tiles is
a safe accumulation).

The first block of a chain runs the same kernel with neutral statistics
(μ=0, inv=1, γ=1, β=0, slope=1) so the raw input passes through
unnormalised — one code path for the whole chain.

Layouts: activations ``[B, U, C]`` with C = 128 lanes (the generator's
folded MRF layout), kernels ``[k', C, C]``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _grc_kernel(
    mean_ref,  # VMEM [1, 1, C]
    inv_ref,  # VMEM [1, 1, C]
    gamma_ref,  # VMEM [1, 1, C]
    beta_ref,  # VMEM [1, 1, C]
    w_ref,  # VMEM [k, C, C]
    bias_ref,  # VMEM [1, C]
    slope_ref,  # SMEM [1, 1]
    pre_in_ref,  # ANY [1, U, C] (stays in HBM; windows DMA'd manually)
    pre_out_ref,  # VMEM [1, tile, C]
    s1_ref,  # VMEM [1, 1, C]
    s2_ref,  # VMEM [1, 1, C]
    win_ref,  # VMEM scratch [S, C], S = tile + 2*halo + k - 1
    cat_ref,  # VMEM scratch [tile, k*C] (tap_concat) or [8, 128] (unused)
    sem,
    *,
    tile: int,
    halo: int,
    lo: int,
    k: int,
    u_total: int,
    tap_concat: bool = False,
):
    b = pl.program_id(0)
    u = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    n_total = pl.num_programs(0) * n_tiles
    C = pre_out_ref.shape[-1]
    # DMA slices must be sublane-aligned (multiples of 8 rows): use an
    # 8-aligned halo and placement offset; all offsets stay multiples of 8.
    halo_al = -(-halo // 8) * 8
    P = -(-lo // 8) * 8  # aligned placement offset of the loaded window
    W = min(tile + 2 * halo_al, u_total)

    def window_dma(slot, b_idx, u_idx):
        """DMA the haloed window of grid step (b_idx, u_idx) into buffer
        ``slot``.  Loaded row r lives at win[slot, P + r - clamped];
        margins hold garbage masked per tap below."""
        start = u_idx * tile - halo_al
        clamped = pl.multiple_of(jnp.clip(start, 0, u_total - W), 8)
        return pltpu.make_async_copy(
            pre_in_ref.at[b_idx, pl.ds(clamped, W), :],
            win_ref.at[slot, pl.ds(P, W), :],
            sem.at[slot],
        )

    # double buffering: compute on this step's slot while the next grid
    # step's window streams in (scratch persists across sequential steps)
    g = b * n_tiles + u
    slot = jax.lax.rem(g, 2)
    nxt_slot = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        window_dma(0, b, u).start()

    @pl.when(g + 1 < n_total)
    def _():
        u_next = jax.lax.rem(u + 1, n_tiles)
        b_next = b + jnp.where(u + 1 == n_tiles, 1, 0)
        window_dma(nxt_slot, b_next, u_next).start()

    window_dma(slot, b, u).wait()

    # normalise + activate the whole window (garbage margins masked later)
    xw = win_ref[slot].astype(jnp.float32)
    xn = (xw - mean_ref[0]) * inv_ref[0]
    xn = xn * gamma_ref[0] + beta_ref[0]
    slope = slope_ref[0, 0]
    y = jnp.where(xn >= 0, xn, slope * xn).astype(win_ref.dtype)

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)

    def compute(base: int):
        """Tap matmuls with a STATIC window offset (Mosaic requires
        statically-provable slice offsets; `base` is a compile-time
        constant inside each pl.when branch)."""
        off = P - lo + base
        acc = y[P + base : P + base + tile].astype(jnp.float32)  # residual
        taps = []
        for j in range(k):
            yj = y[off + j : off + j + tile]
            rows = u * tile - lo + j + t_idx
            valid = (rows >= 0) & (rows < u_total)
            taps.append(jnp.where(valid, yj, jnp.zeros_like(yj)))
        if tap_concat:
            # one deep matmul [tile, k·C] @ [k·C, C]: 3× the contraction
            # depth per MXU pass vs k separate [tile,C]@[C,C] dots.
            # Mosaic cannot concatenate vectors whose source slices have
            # different sublane offsets, so the taps are realigned
            # through a VMEM scratch store first.
            for j in range(k):
                cat_ref[:, j * C:(j + 1) * C] = taps[j]
            wcat = w_ref[...].reshape(k * C, C)
            acc += jnp.dot(cat_ref[...], wcat.astype(cat_ref.dtype),
                           preferred_element_type=jnp.float32)
        else:
            for j in range(k):
                acc += jnp.dot(taps[j], w_ref[j].astype(taps[j].dtype),
                               preferred_element_type=jnp.float32)
        acc += bias_ref[0]
        pre_out_ref[0] = acc.astype(pre_out_ref.dtype)

        @pl.when(u == 0)
        def _():
            s1_ref[0] = jnp.zeros((1, C), jnp.float32)
            s2_ref[0] = jnp.zeros((1, C), jnp.float32)

        s1_ref[0] += jnp.sum(acc, axis=0, keepdims=True)
        s2_ref[0] += jnp.sum(acc * acc, axis=0, keepdims=True)

    # base = u*tile - clamped takes a small set of static values:
    #   W == U (whole input loaded): base = u*tile (branch per tile);
    #   otherwise first tile 0, interior halo_al, last tile 2*halo_al.
    if W == u_total:
        n_static = u_total // tile
        for ui in range(n_static):
            @pl.when(u == ui)
            def _(ui=ui):
                compute(ui * tile)
    else:
        @pl.when(u == 0)
        def _():
            compute(0)

        @pl.when((u > 0) & (u < n_tiles - 1))
        def _():
            compute(halo_al)

        @pl.when(u == n_tiles - 1)
        def _():
            compute(2 * halo_al)


@functools.partial(jax.jit, static_argnames=("lo", "k", "tile", "interpret", "tap_concat"))
def fused_grc_step(
    pre_in: Array,  # [B, U, C]
    mean: Array,  # [B, C] (neutral: zeros)
    inv: Array,  # [B, C] (neutral: ones)
    gamma: Array,  # [B, C]
    beta: Array,  # [B, C]
    w: Array,  # [k, C, C]
    bias: Array,  # [C]
    slope,
    *,
    lo: int,
    k: int,
    tile: int = 2048,
    interpret: bool = False,
    tap_concat: bool = False,
) -> Tuple[Array, Array, Array]:
    """One chain step → (pre_out [B,U,C], s1 [B,C], s2 [B,C])."""
    B, U, C = pre_in.shape
    if U % tile or U < tile:
        tile = U  # degenerate small inputs: single tile per batch row
    halo = max(lo, k - 1 - lo)
    halo_al = -(-halo // 8) * 8
    P = -(-lo // 8) * 8
    # scratch: placement + window + room for the largest tap slice
    S = P + max(U, tile + 2 * halo_al) + k
    grid = (B, U // tile)
    slope_arr = jnp.full((1, 1), slope, jnp.float32)

    kernel = functools.partial(
        _grc_kernel, tile=tile, halo=halo, lo=lo, k=k, u_total=U,
        tap_concat=tap_concat,
    )
    pre_out, s1, s2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda b, u: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, u: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, u: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, u: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C, C), lambda b, u: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, u: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, u: (0, 0), memory_space=pltpu.SMEM),
            # ANY space requires the full array + trivial index map; the
            # kernel DMAs per-batch haloed windows itself.
            pl.BlockSpec((B, U, C), lambda b, u: (0, 0, 0), memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, u: (b, u, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, u: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, u: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, U, C), pre_in.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, S, C), pre_in.dtype),  # double-buffered windows
            pltpu.VMEM((tile, k * C) if tap_concat else (8, 128),
                       pre_in.dtype),             # tap realignment buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(mean[:, None, :], inv[:, None, :], gamma[:, None, :], beta[:, None, :],
      w, bias[None, :], slope_arr, pre_in)
    return pre_out, s1[:, 0, :], s2[:, 0, :]


def grc_chain(
    x: Array,  # [B, U, FC] folded activations
    step_params: list,  # see GRCLoRABlock/grc_chain caller
    *,
    groups: int,
    channels: int,  # true channels (lanes are fold*channels)
    fold: int,
    slope: float,
    interpret: bool = False,
    eps: float = 1e-5,
    tap_concat: bool = False,
    tile: int = 2048,
) -> Array:
    """Run a chain of fused GRC blocks; returns the activated output of
    the last block.  ``step_params[i]`` carries block i's fused conv
    (``w2 [k,FC,FC]``, ``bias [FC]``, ``lo``) and its GroupNorm params
    (``gamma``/``beta`` per true channel).
    """
    from hifigan_tpu.ops.fold import _folded_group_matrix, fold_channel_vector

    B, U, FC = x.shape
    m = jnp.asarray(_folded_group_matrix(channels, groups, fold))  # [FC, G]
    n = U * fold * (channels // groups)

    def stats_to_lane(s1, s2):
        mean_g = (s1 @ m) / n
        var_g = (s2 @ m) / n - jnp.square(mean_g)
        inv_g = jax.lax.rsqrt(var_g + eps)
        return mean_g @ m.T, inv_g @ m.T  # [B, FC]

    cur = x
    s1 = s2 = None
    for i, p in enumerate(step_params):
        if i == 0:
            mean_l = jnp.zeros((B, FC), jnp.float32)
            inv_l = jnp.ones((B, FC), jnp.float32)
            gamma_l = jnp.ones((B, FC), jnp.float32)
            beta_l = jnp.zeros((B, FC), jnp.float32)
            sl = 1.0  # identity: raw chain input
        else:
            mean_l, inv_l = stats_to_lane(s1, s2)
            prev = step_params[i - 1]
            gamma_l = jnp.broadcast_to(
                fold_channel_vector(prev["gamma"], fold).astype(jnp.float32)[None],
                (B, FC))
            beta_l = jnp.broadcast_to(
                fold_channel_vector(prev["beta"], fold).astype(jnp.float32)[None],
                (B, FC))
            sl = slope
        cur, s1, s2 = fused_grc_step(
            cur, mean_l, inv_l, gamma_l, beta_l,
            p["w2"], p["bias"], sl, lo=p["lo"], k=p["w2"].shape[0],
            interpret=interpret, tap_concat=tap_concat, tile=tile,
        )
    # final normalise + activate (elementwise; XLA fuses it downstream)
    mean_l, inv_l = stats_to_lane(s1, s2)
    last = step_params[-1]
    g_l = fold_channel_vector(last["gamma"], fold).astype(jnp.float32)[None, None, :]
    b_l = fold_channel_vector(last["beta"], fold).astype(jnp.float32)[None, None, :]
    y = (cur.astype(jnp.float32) - mean_l[:, None, :]) * inv_l[:, None, :] * g_l + b_l
    y = jnp.where(y >= 0, y, slope * y)
    return y.astype(x.dtype)
