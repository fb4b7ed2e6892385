"""Incremental (KV-cached) text decoding.

The reference's ``SequenceGenerator`` carries fairseq incremental states
across policy calls and prunes them on retraction
(``/root/reference/agent/sequence_generator.py:93-99, 165-194``;
``agent/speech_to_speech.streamspeech.agent.py:554-574``).  Round 1
re-ran the full ``[1, max_target_len]`` causal decoder once per
generated token — O(L²·steps).  This module is the TPU-native
incremental path:

* static ``[B, max_len, heads, head_dim]`` self-attention K/V buffers
  with a traced write index — one compiled program serves every step;
* cross-attention K/V computed **once per policy call** (the encoder
  memory changes every call as audio arrives, so cross K/V cannot
  persist; self K/V can and does — fairseq semantics);
* ``prefill`` packs the whole known prefix in one fused program (used
  after retraction or on a fresh session);
* retraction = lowering the write index (stale rows are masked out).

Implemented as pure functions over the flax param subtree of
:class:`hifigan_tpu.models.streamspeech.SimultaneousTextDecoder` so the
incremental math is unit-testable against the full forward to the last
ulp (``tests/test_incremental.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.models.layers import sinusoidal_positions

Array = jax.Array


class DecoderCache(flax.struct.PyTreeNode):
    """Self-attention KV state: ``k``/``v`` are
    ``[n_layers, B, max_len, heads, head_dim]``; ``index`` is the number
    of positions already written (the next write slot)."""

    k: Array
    v: Array
    index: Array  # int32 scalar

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


@dataclass(frozen=True)
class DecoderSpec:
    """Static hyper-parameters mirrored from
    :class:`SimultaneousTextDecoder`."""

    num_layers: int
    num_heads: int
    hidden_dim: int
    vocab_size: int
    max_len: int = 4096

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads


def _dense(p: Any, x: Array) -> Array:
    """DenseGeneral with kernel [..in.., ..out..] applied over the last axis."""
    kernel = p["kernel"]
    n_in = x.ndim - 1
    out = jnp.tensordot(x, kernel, axes=(list(range(n_in, x.ndim)), [0]))
    return out + p["bias"]


def _dense_merge2(p: Any, x: Array) -> Array:
    """DenseGeneral contracting the last TWO axes (the ``out`` proj:
    kernel ``[H, hd, D]``)."""
    kernel = p["kernel"]
    out = jnp.tensordot(x, kernel, axes=([x.ndim - 2, x.ndim - 1], [0, 1]))
    return out + p["bias"]


def _layer_norm(p: Any, x: Array, eps: float = 1e-6) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha(q: Array, k: Array, v: Array, mask: Array | None, out_p: Any) -> Array:
    """q [B,Tq,H,d], k/v [B,Tk,H,d] → [B,Tq,D]."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(head_dim)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return _dense_merge2(out_p, out)


def cross_kv(params: Any, spec: DecoderSpec, memory: Array) -> tuple[Array, Array]:
    """Project encoder memory ``[B, S, D]`` to per-layer cross K/V
    ``[n_layers, B, S, H, hd]`` (once per policy call)."""
    ks, vs = [], []
    for i in range(spec.num_layers):
        lp = params[f"layer_{i}"]["cross_mha"]
        ks.append(_dense(lp["k"], memory))
        vs.append(_dense(lp["v"], memory))
    return jnp.stack(ks), jnp.stack(vs)


def init_cache(spec: DecoderSpec, batch: int, max_len: int) -> DecoderCache:
    shape = (spec.num_layers, batch, max_len, spec.num_heads, spec.head_dim)
    return DecoderCache(
        k=jnp.zeros(shape, jnp.float32),
        v=jnp.zeros(shape, jnp.float32),
        index=jnp.zeros((), jnp.int32),
    )


def _decoder_layer(
    lp: Any,
    x: Array,
    self_k: Array,
    self_v: Array,
    self_mask: Array | None,
    ck: Array,
    cv: Array,
    cross_mask: Array | None,
) -> Array:
    h = _mha(_dense(lp["self_mha"]["q"], x), self_k, self_v, self_mask,
             lp["self_mha"]["out"])
    x = _layer_norm(lp["norm1"], x + h)
    h = _mha(_dense(lp["cross_mha"]["q"], x), ck, cv, cross_mask,
             lp["cross_mha"]["out"])
    x = _layer_norm(lp["norm2"], x + h)
    f = jax.nn.relu(_dense(lp["ffn1"], x))
    f = _dense(lp["ffn2"], f)
    return _layer_norm(lp["norm3"], x + f)


def prefill(
    params: Any,
    spec: DecoderSpec,
    ckv: tuple[Array, Array],
    tokens: Array,  # [B, L] int32 (static L ≤ max_len buffer)
    cache: DecoderCache,
    cross_mask: Array | None = None,  # [B|1, 1, L|1, S] bool
) -> tuple[Array, DecoderCache]:
    """Causal forward over the whole token buffer, filling the self K/V
    cache for every position and returning per-position logits.

    ``cache.index`` afterwards is NOT set here — the caller assigns the
    number of *valid* positions via :func:`with_index` (the buffer tail
    is padding)."""
    B, L = tokens.shape
    # sqrt(d) embedding scale — must mirror SimultaneousTextDecoder
    emb = params["token_embedding"]["embedding"][tokens] * math.sqrt(spec.hidden_dim)
    pos = jnp.asarray(sinusoidal_positions(spec.max_len, spec.hidden_dim)[:L])
    x = (emb + pos[None]).astype(jnp.float32)
    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
    new_k, new_v = [], []
    ck_all, cv_all = ckv
    for i in range(spec.num_layers):
        lp = params[f"layer_{i}"]
        k = _dense(lp["self_mha"]["k"], x)
        v = _dense(lp["self_mha"]["v"], x)
        new_k.append(k)
        new_v.append(v)
        x = _decoder_layer(lp, x, k, v, causal, ck_all[i], cv_all[i], cross_mask)
    logits = _dense(params["output_proj"], x)
    k_stack = jnp.stack(new_k)  # [n_layers, B, L, H, hd]
    v_stack = jnp.stack(new_v)
    k_buf = jax.lax.dynamic_update_slice(
        cache.k, k_stack, (0, 0, 0, 0, 0)
    )
    v_buf = jax.lax.dynamic_update_slice(
        cache.v, v_stack, (0, 0, 0, 0, 0)
    )
    return logits, cache.replace(k=k_buf, v=v_buf)


def decode_step(
    params: Any,
    spec: DecoderSpec,
    ckv: tuple[Array, Array],
    cache: DecoderCache,
    token: Array,  # [B] int32 — token at position cache.index
    cross_mask: Array | None = None,  # [B|1, 1, 1, S] bool
    return_features: bool = False,
):
    """One incremental decode step: O(max_len) attention, O(1) in prefix
    re-computation.  Returns logits ``[B, vocab]`` for the next token
    and the cache advanced by one position (+ the pre-projection
    decoder features ``[B, D]`` when ``return_features`` — feeds the
    learned HMT transition head)."""
    B = token.shape[0]
    idx = cache.index
    emb = (params["token_embedding"]["embedding"][token[:, None]]
           * math.sqrt(spec.hidden_dim))  # [B,1,D]
    pos = jnp.asarray(sinusoidal_positions(spec.max_len, spec.hidden_dim))
    x = (emb + jax.lax.dynamic_slice_in_dim(pos, idx, 1, axis=0)[None]).astype(
        jnp.float32
    )
    max_len = cache.max_len
    visible = jnp.arange(max_len) <= idx  # [max_len]
    self_mask = visible[None, None, None, :]
    ck_all, cv_all = ckv
    ks, vs = [], []
    for i in range(spec.num_layers):
        lp = params[f"layer_{i}"]
        k1 = _dense(lp["self_mha"]["k"], x)  # [B,1,H,hd]
        v1 = _dense(lp["self_mha"]["v"], x)
        k_buf = jax.lax.dynamic_update_slice(
            cache.k[i], k1, (0, idx, 0, 0)
        )
        v_buf = jax.lax.dynamic_update_slice(
            cache.v[i], v1, (0, idx, 0, 0)
        )
        ks.append(k_buf)
        vs.append(v_buf)
        x = _decoder_layer(lp, x, k_buf, v_buf, self_mask, ck_all[i], cv_all[i],
                           cross_mask)
    logits = _dense(params["output_proj"], x)[:, 0]
    new_cache = DecoderCache(k=jnp.stack(ks), v=jnp.stack(vs), index=idx + 1)
    if return_features:
        return logits, new_cache, x[:, 0]
    return logits, new_cache


def with_index(cache: DecoderCache, index) -> DecoderCache:
    """Set the write index (host-side retraction/pruning: lowering the
    index invalidates the tail rows — they are masked out of attention)."""
    return cache.replace(index=jnp.asarray(index, jnp.int32))


def gather_beams(cache: DecoderCache, parent: Array) -> DecoderCache:
    """Reorder the batch/beam axis after a beam-search step
    (reference ``reorder_incremental_state``)."""
    return cache.replace(k=cache.k[:, parent], v=cache.v[:, parent])
