"""Sequence parallelism for the chunked Conformer encoder.

SURVEY.md §5.7: the reference's only long-sequence mechanism is chunked
streaming; the TPU-native extension chosen there is *sequence sharding
over the mesh* for long utterances.  This module implements it: the
time axis is sharded over a mesh axis and the encoder forward runs
inside one ``shard_map`` program with explicit collectives —

* **attention**: queries stay local; keys/values are ``all_gather``-ed
  along time (the chunk mask is block-*causal* — every chunk attends to
  all previous chunks — so each shard genuinely needs earlier shards'
  K/V; gathering K/V and masking from *global* positions reproduces the
  unsharded math exactly);
* **causal depthwise conv** (k=15): only the previous shard's last
  ``k−1`` frames are needed — a single ``ppermute`` halo exchange
  (shard 0's halo arrives as ``ppermute``'s zero-fill, which equals the
  unsharded left zero-padding);
* everything else (FFN, LayerNorm, GLU, projections) is positionwise
  and runs shard-local with replicated parameters.

The forward is re-implemented as pure functions over the flax param
tree (the pattern of :mod:`hifigan_tpu.streaming.incremental`), so the
same checkpoint serves sharded and unsharded execution; parity is
asserted in ``tests/test_sequence_parallel.py`` on the 8-device CPU
mesh.

Reference anchor: chunk-masked attention
``/root/reference/streamspeech_integration.py:43-66, 99-114`` (the
semantics being sharded).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hifigan_tpu.models.layers import sinusoidal_positions

Array = jax.Array


def _layer_norm(x: Array, p: Any, eps: float = 1e-6) -> Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha_seq_sharded(x: Array, p: Any, *, num_heads: int, axis: str,
                     offset: Array, chunk_size: int, T_global: int) -> Array:
    """Local-query / gathered-KV attention with a block-causal mask
    built from GLOBAL positions (exact chunked-attention semantics)."""
    d = x.shape[-1]
    hd = d // num_heads
    q = jnp.einsum("btd,dhk->bthk", x, p["q"]["kernel"]) + p["q"]["bias"]
    k = jnp.einsum("btd,dhk->bthk", x, p["k"]["kernel"]) + p["k"]["bias"]
    v = jnp.einsum("btd,dhk->bthk", x, p["v"]["kernel"]) + p["v"]["bias"]
    # tiled=True concatenates shards along the time axis → [B, T, H, hd]
    kg = jax.lax.all_gather(k, axis, axis=1, tiled=True)
    vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, kg,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    q_blocks = (offset + jnp.arange(x.shape[1])) // chunk_size
    k_blocks = jnp.arange(T_global) // chunk_size
    mask = (k_blocks[None, :] <= q_blocks[:, None])[None, None]
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vg,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return (jnp.einsum("bqhd,hdk->bqk", out, p["out"]["kernel"])
            + p["out"]["bias"])


def _conv_module_seq_sharded(x: Array, p: Any, *, axis: str,
                             n_shards: int) -> Array:
    """pw1 → GLU → causal depthwise(k) with ppermute halo → norm →
    ReLU → pw2 (ConformerConvModule, causal=True)."""
    h = x @ p["pw1"]["kernel"] + p["pw1"]["bias"]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)
    w = p["dw_kernel"]  # [k, 1, d]
    k = w.shape[0]
    Tl = h.shape[1]
    # halo: the k−1 frames preceding this shard — possibly spanning
    # several previous shards when shards are shorter than the
    # receptive field.  hop h's ppermute delivers shard i−h's frames
    # (zero-filled past the sequence start, == the unsharded left
    # zero-pad of the causal conv).
    need = k - 1
    hops = -(-need // Tl)
    parts = [
        jax.lax.ppermute(
            h, axis, perm=[(i, i + hop) for i in range(n_shards - hop)],
        )
        for hop in range(hops, 0, -1)
    ]
    hp = jnp.concatenate(parts + [h], axis=1)[:, -(need + Tl):, :]
    out = sum(hp[:, j:j + Tl, :] * w[j, 0][None, None, :] for j in range(k))
    out = out + p["dw_bias"]
    out = _layer_norm(out, p["norm"]).astype(x.dtype)
    out = jax.nn.relu(out)
    return out @ p["pw2"]["kernel"] + p["pw2"]["bias"]


def conformer_forward_seq_sharded(
    params: Any,
    mel: Array,  # [B, T, input_dim], T % n_shards == 0
    mesh: Mesh,
    *,
    axis: str = "data",
    num_layers: int,
    num_heads: int,
    chunk_size: int,
    max_len: int = 8192,
    dtype=jnp.float32,
) -> Array:
    """Run ``ChunkedConformer.__call__(mel, chunked=True)`` with the
    time axis sharded over ``mesh[axis]``.  ``params`` is the
    ChunkedConformer param subtree (``{"params": {...}}`` or the inner
    dict); output matches the unsharded forward."""
    tree = params.get("params", params)
    n_shards = mesh.shape[axis]
    B, T, _ = mel.shape
    if T % n_shards:
        raise ValueError(f"T={T} not divisible by {n_shards} shards")
    T_local = T // n_shards
    pos_table = jnp.asarray(sinusoidal_positions(max_len, tree["input_proj"]["kernel"].shape[1]))

    def forward(tree, x_local):
        idx = jax.lax.axis_index(axis)
        offset = idx * T_local
        h = (x_local.astype(dtype) @ tree["input_proj"]["kernel"]
             + tree["input_proj"]["bias"])
        pos = jax.lax.dynamic_slice_in_dim(pos_table, offset, T_local)
        h = h + pos[None].astype(dtype)
        for i in range(num_layers):
            lp = tree[f"layer_{i}"]
            attn = _mha_seq_sharded(
                h, lp["mha"], num_heads=num_heads, axis=axis,
                offset=offset, chunk_size=chunk_size, T_global=T,
            ).astype(dtype)
            h = _layer_norm(h + attn, lp["attn_norm"]).astype(dtype)
            f = jax.nn.relu(h @ lp["ffn1"]["kernel"] + lp["ffn1"]["bias"])
            f = f @ lp["ffn2"]["kernel"] + lp["ffn2"]["bias"]
            h = _layer_norm(h + f, lp["ffn_norm"]).astype(dtype)
            c = _conv_module_seq_sharded(
                h, lp["conv"], axis=axis, n_shards=n_shards,
            ).astype(dtype)
            h = _layer_norm(h + c, lp["conv_norm"]).astype(dtype)
        return h @ tree["output_proj"]["kernel"] + tree["output_proj"]["bias"]

    shard_spec = P(None, axis, None)
    sharded = jax.jit(
        jax.shard_map(
            forward, mesh=mesh,
            in_specs=(P(), shard_spec), out_specs=shard_spec,
        )
    )
    mel = jax.device_put(mel, NamedSharding(mesh, shard_spec))
    tree = jax.device_put(tree, NamedSharding(mesh, P()))
    return sharded(tree, mel)
