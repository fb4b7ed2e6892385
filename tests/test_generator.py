"""Generator / discriminator forward-pass tests (shape + finiteness +
conditioning sensitivity), mirroring the reference smoke tests
(/root/reference/hifigan_modified/generator.py:305-327,
 discriminators.py:153-174) but as real assertions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifigan_tpu.models.generator import (
    Generator,
    GeneratorConfig,
    HiFiGANV1Generator,
    ODConv1d,
    ODConvTranspose1d,
    GRCLoRABlock,
)
from hifigan_tpu.models.discriminators import Discriminators

SMALL = GeneratorConfig(
    hidden_channels=32,
    upsample_factors=(4, 2),
    resblock_kernel_sizes=(3, 7),
    resblock_dilations=((1, 3), (1, 3)),
    lora_rank=4,
)


@pytest.fixture(scope="module")
def gen_small():
    model = Generator(SMALL)
    rng = jax.random.PRNGKey(0)
    mel = jnp.zeros((2, 80, 16))
    spk = jnp.zeros((2, 192))
    emo = jnp.zeros((2, 256))
    params = model.init(rng, mel, spk, emo)
    return model, params


def test_generator_upsamples_256x_full_config():
    """Flagship config: [B,80,T] -> [B,1,256*T] (8*8*2*2=256)."""
    model = Generator(GeneratorConfig())
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (1, 80, 8))
    spk = jax.random.normal(rng, (1, 192))
    emo = jax.random.normal(rng, (1, 256))
    params = model.init(rng, mel, spk, emo)
    wav = model.apply(params, mel, spk, emo)
    assert wav.shape == (1, 1, 8 * 256)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0  # tanh output


def test_generator_small_shapes_and_conditioning(gen_small):
    model, params = gen_small
    rng = jax.random.PRNGKey(1)
    mel = jax.random.normal(rng, (2, 80, 16))
    spk = jax.random.normal(jax.random.PRNGKey(2), (2, 192))
    emo = jax.random.normal(jax.random.PRNGKey(3), (2, 256))
    wav = model.apply(params, mel, spk, emo)
    assert wav.shape == (2, 1, 16 * 8)
    # conditioning must change the output
    wav2 = model.apply(params, mel, spk + 1.0, emo)
    assert np.abs(np.asarray(wav) - np.asarray(wav2)).max() > 1e-6
    wav3 = model.apply(params, mel, spk, emo + 1.0)
    assert np.abs(np.asarray(wav) - np.asarray(wav3)).max() > 1e-6


def test_generator_jit_and_grad(gen_small):
    model, params = gen_small
    mel = jnp.ones((2, 80, 16))
    spk = jnp.ones((2, 192)) * 0.1
    emo = jnp.ones((2, 256)) * 0.1

    fwd = jax.jit(lambda p: model.apply(p, mel, spk, emo))
    wav = fwd(params)
    assert wav.shape == (2, 1, 128)

    def loss_fn(p):
        return jnp.mean(jnp.square(model.apply(p, mel, spk, emo)))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradients reach the ODConv kernel banks and the LoRA A matrices
    flat = {"/".join(str(k) for k in p): v
            for p, v in jax.tree_util.tree_leaves_with_path(grads)}
    assert any("kernels" in k and float(jnp.abs(v).max()) > 0 for k, v in flat.items())
    assert any("lora_A" in k for k in flat)


def test_odconv1d_module(rng):
    m = ODConv1d(in_features=8, out_features=12, kernel_size=3, padding=1)
    x = jnp.asarray(rng.standard_normal((2, 20, 8), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 20, 12)
    # per-sample dynamics: permuting the batch permutes outputs identically
    y_swap = m.apply(params, x[::-1])
    np.testing.assert_allclose(np.asarray(y_swap), np.asarray(y)[::-1], rtol=2e-3, atol=2e-3)


def test_odconv_transpose_module(rng):
    m = ODConvTranspose1d(in_features=8, out_features=4, kernel_size=8, stride=4, padding=2)
    x = jnp.asarray(rng.standard_normal((2, 10, 8), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 40, 4)


def test_grc_lora_block_zero_init_is_conv_path_only(rng):
    """lora_B zero-init ⇒ the LoRA path contributes nothing at init."""
    m = GRCLoRABlock(channels=16, kernel_size=3, dilation=2, groups=4, lora_rank=4)
    x = jnp.asarray(rng.standard_normal((2, 20, 16), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    # scaling lora_A must not change output while B == 0
    import flax
    p2 = flax.core.unfreeze(params)
    p2["params"]["lora_A"] = p2["params"]["lora_A"] * 100.0
    y2 = m.apply(flax.core.freeze(p2), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5, atol=1e-5)


def test_hifigan_v1_generator():
    model = HiFiGANV1Generator()
    mel = jnp.ones((1, 80, 8))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.shape == (1, 1, 8 * 256)


def test_discriminators_heads_and_features():
    model = Discriminators()
    wav = jnp.ones((2, 1, 1000))
    params = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(params, wav)
    assert len(out["mpd_outputs"]) == 5
    assert len(out["msd_outputs"]) == 3
    assert len(out["mpd_features"][0]) == 4  # 4 intermediate LeakyReLU maps
    # MSD scale-1 head output keeps time length (k=15, pad 7)
    assert out["msd_outputs"][0].shape[1] == 1000
    for o in out["mpd_outputs"] + out["msd_outputs"]:
        assert np.isfinite(np.asarray(o)).all()
