"""Parity tests for time-folded execution (ops/fold.py): folded layers
must be bit-comparable to their unfolded counterparts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifigan_tpu.ops import conv as conv_ops
from hifigan_tpu.ops import fold as fold_ops
from hifigan_tpu.ops import grc_lora as lora_ops
from hifigan_tpu.models.generator import GRCLoRABlock


def test_fold_unfold_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 8), dtype=np.float32))
    f = fold_ops.fold_time(x, 4)
    assert f.shape == (2, 8, 32)
    np.testing.assert_array_equal(np.asarray(fold_ops.unfold_time(f, 4)), np.asarray(x))


@pytest.mark.parametrize("k,dilation", [(3, 1), (3, 5), (7, 1), (11, 5), (7, 3)])
def test_folded_conv_matches_direct(rng, k, dilation):
    B, T, C, F = 2, 64, 8, 4
    pad = (k - 1) * dilation // 2
    x = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, C, C), dtype=np.float32))
    direct = conv_ops.conv1d(x, w, padding=pad, dilation=dilation)
    wf, lo, hi = fold_ops.fold_conv_kernel(w, F, padding=pad, dilation=dilation)
    folded = conv_ops.conv1d(fold_ops.fold_time(x, F), wf, padding=(lo, hi))
    out = fold_ops.unfold_time(folded, F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), rtol=1e-4, atol=1e-4)


def test_folded_group_norm_matches(rng):
    B, T, C, G, F = 2, 64, 8, 4, 4
    x = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32))
    gamma = jnp.asarray(rng.standard_normal(C, dtype=np.float32))
    beta = jnp.asarray(rng.standard_normal(C, dtype=np.float32))
    direct = lora_ops.group_norm(x, gamma, beta, G)
    folded = fold_ops.folded_group_norm(fold_ops.fold_time(x, F), gamma, beta, G, C, F)
    np.testing.assert_allclose(
        np.asarray(fold_ops.unfold_time(folded, F)), np.asarray(direct),
        rtol=1e-4, atol=1e-4,
    )


def test_group_norm_matches_torch(rng):
    import torch
    B, T, C, G = 2, 20, 16, 4
    x = rng.standard_normal((B, T, C), dtype=np.float32)
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    ours = lora_ops.group_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), G)
    gn = torch.nn.GroupNorm(G, C)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gamma))
        gn.bias.copy_(torch.from_numpy(beta))
        ref = gn(torch.from_numpy(x).transpose(1, 2)).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("k,dilation", [(3, 1), (11, 5)])
def test_grc_block_folded_matches_unfolded(rng, k, dilation):
    B, T, C, F = 2, 64, 8, 4
    x = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32))
    m_plain = GRCLoRABlock(channels=C, kernel_size=k, dilation=dilation, lora_rank=4)
    m_fold = GRCLoRABlock(channels=C, kernel_size=k, dilation=dilation, lora_rank=4, fold=F)
    params = m_plain.init(jax.random.PRNGKey(0), x)
    # make the LoRA path non-trivial (lora_B zero-init would hide bugs)
    import flax
    p = flax.core.unfreeze(params)
    p["params"]["lora_B"] = jnp.asarray(
        rng.standard_normal(p["params"]["lora_B"].shape, dtype=np.float32)
    )
    params = flax.core.freeze(p)
    y_plain = m_plain.apply(params, x)
    y_fold = fold_ops.unfold_time(m_fold.apply(params, fold_ops.fold_time(x, F)), F)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_plain), rtol=1e-4, atol=1e-4)


def test_lora_block_matrix_matches_reference_loop(rng):
    """blockdiag(A^T B^T) == per-group torch-style loop
    (/root/reference/hifigan_modified/generator.py:153-159)."""
    C, G, r = 16, 4, 4
    x = rng.standard_normal((2, 10, C), dtype=np.float32)
    a = rng.standard_normal((r, C // G), dtype=np.float32)
    b = rng.standard_normal((C // G, r), dtype=np.float32)
    ours = lora_ops.grouped_lora(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), G)
    ref = np.zeros_like(x)
    for g in range(G):
        xg = x[:, :, g * (C // G):(g + 1) * (C // G)]
        ref[:, :, g * (C // G):(g + 1) * (C // G)] = (xg @ a.T) @ b.T
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fin,f", [(1, 4), (2, 2), (4, 2)])
def test_folded_dynamic_conv_transpose_matches_unfolded(rng, fin, f):
    """folded path == unfolded dynamic transposed conv (exact k=2p+f)."""
    B, U, Cin, Cout = 2, 8, 6, 4
    k, pad = 2 * f, f // 2
    T = U * fin
    x = jnp.asarray(rng.standard_normal((B, T, Cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((B, Cin, Cout, k), dtype=np.float32))
    ref = conv_ops.dynamic_conv_transpose1d(x, w, stride=f, padding=pad)
    xf = fold_ops.fold_time(x, fin) if fin > 1 else x
    yf = conv_ops.folded_dynamic_conv_transpose1d(
        xf, w, stride=f, padding=pad, fold_in=fin)
    y = yf.reshape(B, T * f, Cout)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fin,f", [(1, 4), (2, 2)])
def test_polyphase_space_spatial_attention_matches(rng, fin, f):
    """Mixing K banks + per-tap (spatial) scaling in polyphase space must
    equal building the per-sample kernel first (the ODConvTranspose1d
    fast path vs the definitional path)."""
    B, K, Cin, Cout = 2, 4, 6, 4
    k, pad = 2 * f, f // 2
    U = 8
    T = U * fin
    x = jnp.asarray(rng.standard_normal((B, T, Cin), dtype=np.float32))
    banks = jnp.asarray(rng.standard_normal((K, Cin, Cout, k), dtype=np.float32))
    a = jnp.asarray(rng.random((B, K), dtype=np.float32))
    sp = jnp.asarray(rng.random((B, k), dtype=np.float32))

    # definitional: per-sample kernel, then folded conv
    w_b = jnp.einsum("bk,kiod->biod", a, banks) * sp[:, None, None, :]
    xf = fold_ops.fold_time(x, fin) if fin > 1 else x
    ref = conv_ops.folded_dynamic_conv_transpose1d(
        xf, w_b, stride=f, padding=pad, fold_in=fin)

    # fast path: transform banks, mix + tap-scale in polyphase space
    wp_banks, deltas = conv_ops.folded_polyphase_kernel(banks, f, pad, fin)
    w_poly = jnp.einsum("bk,kpq->bpq", a, wp_banks)
    tap, valid, deltas2 = conv_ops.folded_tap_map(k, f, pad, fin)
    assert deltas == deltas2
    spm = sp[:, jnp.asarray(tap)] * jnp.asarray(valid, np.float32)
    P, Q = w_poly.shape[1:]
    dq, cr = tap.shape
    w_poly = (w_poly.reshape(B, dq, Cin, cr, Cout) * spm[:, :, None, :, None]
              ).reshape(B, P, Q)
    out = conv_ops.folded_polyphase_apply(xf, w_poly, deltas, stride=f, fold_in=fin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
