"""Pallas fused GRC-chain parity vs the XLA folded path (interpret mode
on the CPU backend)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifigan_tpu.models.generator import Generator, GeneratorConfig, GRCLoRABlock
from hifigan_tpu.ops.pallas import fused_grc_step, grc_chain


def _make_blocks(rng, C, F, ks_dil, seed=0):
    blocks, params = [], []
    x = jnp.zeros((2, 8, F * C))
    for j, (k, d) in enumerate(ks_dil):
        m = GRCLoRABlock(channels=C, kernel_size=k, dilation=d, lora_rank=4, fold=F)
        p = m.init(jax.random.PRNGKey(seed + j), x)
        # randomise params incl. lora_B and norm affine so nothing hides
        leaves, treedef = jax.tree_util.tree_flatten(p)
        g = np.random.default_rng(seed + j)
        leaves = [jnp.asarray(g.normal(0, 0.3, l.shape).astype(np.float32))
                  for l in leaves]
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        blocks.append(m)
        params.append(p)
    return blocks, params


@pytest.mark.parametrize("ks_dil", [
    [(3, 1), (3, 3), (3, 5)],
    [(11, 1), (11, 3), (11, 5)],
])
def test_grc_chain_matches_sequential_blocks(rng, ks_dil):
    C, F, B, U = 8, 4, 2, 16
    blocks, params = _make_blocks(rng, C, F, ks_dil)
    x = jnp.asarray(rng.standard_normal((B, U, F * C), dtype=np.float32))

    # XLA reference: sequential folded blocks
    y_ref = x
    for m, p in zip(blocks, params):
        y_ref = m.apply(p, y_ref)

    comps = [m.apply(p, x, return_fused=True) for m, p in zip(blocks, params)]
    y_chain = grc_chain(
        x, comps, groups=4, channels=C, fold=F, slope=0.1, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y_chain), np.asarray(y_ref), rtol=2e-3, atol=2e-3
    )


def test_fused_grc_step_neutral_stats_is_conv_plus_residual(rng):
    """With μ=0, inv=1, γ=1, β=0, slope=1 the step must equal
    conv(x) + bias + x and return exact channel sums."""
    from hifigan_tpu.ops import conv as conv_ops

    B, U, C, k, lo = 2, 16, 32, 3, 1
    x = jnp.asarray(rng.standard_normal((B, U, C), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, C, C), dtype=np.float32)) * 0.1
    bias = jnp.asarray(rng.standard_normal(C, dtype=np.float32))
    pre, s1, s2 = fused_grc_step(
        x,
        jnp.zeros((B, C)), jnp.ones((B, C)), jnp.ones((B, C)), jnp.zeros((B, C)),
        w, bias, 1.0, lo=lo, k=k, interpret=True,
    )
    ref = conv_ops.conv1d(x, w, bias, padding=(lo, k - 1 - lo)) + x
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(ref.sum(axis=1)),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray((ref**2).sum(axis=1)),
                               rtol=1e-3, atol=1e-3)


def test_generator_pallas_backend_matches_xla(rng):
    """Full tiny generator: mrf_backend='pallas' (interpret) must match
    the XLA path bit-for-tolerance."""
    cfg_x = GeneratorConfig(
        input_channels=16, hidden_channels=32, upsample_factors=(4, 2),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        lora_rank=4, mrf_backend="xla",
    )
    cfg_p = GeneratorConfig(
        input_channels=16, hidden_channels=32, upsample_factors=(4, 2),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        lora_rank=4, mrf_backend="pallas",
    )
    mel = jnp.asarray(rng.standard_normal((2, 16, 16), dtype=np.float32))
    spk = jnp.asarray(rng.standard_normal((2, 192), dtype=np.float32))
    emo = jnp.asarray(rng.standard_normal((2, 256), dtype=np.float32))
    mx = Generator(cfg_x)
    params = mx.init(jax.random.PRNGKey(0), mel, spk, emo)
    y_x = mx.apply(params, mel, spk, emo)
    y_p = Generator(cfg_p).apply(params, mel, spk, emo)  # identical param tree
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=2e-3, atol=2e-3)
