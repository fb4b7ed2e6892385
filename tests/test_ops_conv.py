"""Numerical parity of the TPU conv formulations against torch reference math.

The dynamic (per-sample-filter) convs are validated against a loop of
``torch.nn.functional.conv1d`` / ``conv_transpose1d`` calls — the
semantics the reference's ODConv realises per sample
(/root/reference/hifigan_modified/odconv.py:89-103, :180-205)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from hifigan_tpu.ops import conv as conv_ops


def _t(x):
    return torch.from_numpy(np.asarray(x))


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 0, 1, 1),
    (1, 3, 1, 1),
    (2, 2, 1, 1),
    (1, 2, 2, 1),
    (1, 1, 1, 4),
])
def test_conv1d_matches_torch(rng, stride, padding, dilation, groups):
    B, T, Cin, Cout, k = 2, 31, 8, 12, 3
    x = rng.standard_normal((B, T, Cin), dtype=np.float32)
    w = rng.standard_normal((k, Cin // groups, Cout), dtype=np.float32)
    b = rng.standard_normal((Cout,), dtype=np.float32)

    y = conv_ops.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                        stride=stride, padding=padding, dilation=dilation, groups=groups)
    # torch layout: x [B, Cin, T], w [Cout, Cin//g, k]
    yt = F.conv1d(_t(x).transpose(1, 2), _t(w).permute(2, 1, 0), _t(b),
                  stride=stride, padding=padding, dilation=dilation, groups=groups)
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,k,padding", [
    (4, 8, 2),   # generator stage shape: k=2f, p=f//2
    (2, 4, 1),
    (3, 7, 0),   # k not a multiple of stride
    (1, 3, 1),
])
def test_conv_transpose1d_matches_torch(rng, stride, k, padding):
    B, T, Cin, Cout = 2, 13, 6, 10
    x = rng.standard_normal((B, T, Cin), dtype=np.float32)
    w = rng.standard_normal((Cin, Cout, k), dtype=np.float32)
    b = rng.standard_normal((Cout,), dtype=np.float32)

    y = conv_ops.conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                  stride=stride, padding=padding)
    yt = F.conv_transpose1d(_t(x).transpose(1, 2), _t(w), _t(b),
                            stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(y), yt.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding,dilation", [
    (1, 1, 1),
    (2, 3, 1),
    (1, 4, 2),
])
def test_dynamic_conv1d_matches_per_sample_torch(rng, stride, padding, dilation):
    B, T, Cin, Cout, k = 3, 25, 5, 7, 3
    x = rng.standard_normal((B, T, Cin), dtype=np.float32)
    w = rng.standard_normal((B, k, Cin, Cout), dtype=np.float32)
    b = rng.standard_normal((B, Cout), dtype=np.float32)

    y = conv_ops.dynamic_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                stride=stride, padding=padding, dilation=dilation)
    outs = []
    for i in range(B):
        outs.append(F.conv1d(
            _t(x[i : i + 1]).transpose(1, 2), _t(w[i]).permute(2, 1, 0), _t(b[i]),
            stride=stride, padding=padding, dilation=dilation,
        ))
    yt = torch.cat(outs, 0).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("f", [2, 4, 8])
def test_dynamic_conv_transpose1d_matches_per_sample_torch(rng, f):
    """Generator upsampler shapes: kernel 2f, stride f, padding f//2 →
    output length exactly T*f (reference generator.py:226-234)."""
    B, T, Cin, Cout = 2, 9, 6, 4
    k, padding = 2 * f, f // 2
    x = rng.standard_normal((B, T, Cin), dtype=np.float32)
    w = rng.standard_normal((B, Cin, Cout, k), dtype=np.float32)
    b = rng.standard_normal((B, Cout), dtype=np.float32)

    y = conv_ops.dynamic_conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                          stride=f, padding=padding)
    assert y.shape == (B, T * f, Cout)
    outs = []
    for i in range(B):
        outs.append(F.conv_transpose1d(
            _t(x[i : i + 1]).transpose(1, 2), _t(w[i]), _t(b[i]),
            stride=f, padding=padding,
        ))
    yt = torch.cat(outs, 0).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


def test_avg_pool1d_matches_torch(rng):
    B, T, C = 2, 24, 5
    x = rng.standard_normal((B, T, C), dtype=np.float32)
    for window in (2, 4):
        y = conv_ops.avg_pool1d(jnp.asarray(x), window)
        yt = F.avg_pool1d(_t(x).transpose(1, 2), window).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-5)


def test_extract_patches_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 20, 3), dtype=np.float32))
    p = conv_ops.extract_patches_1d(x, 5, stride=2, padding=2, dilation=1)
    assert p.shape == (2, (20 + 4 - 4 - 1) // 2 + 1, 5, 3)
