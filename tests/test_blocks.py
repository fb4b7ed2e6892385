"""Standalone GRC / parallel MRF block tests (reference grc_lora.py
standalone variants) + Hokkien postprocessing."""

import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.models.blocks import ParallelMRFBlock, StandaloneGRCBlock


def test_standalone_grc_same_channels(rng):
    m = StandaloneGRCBlock(in_channels=16, out_channels=16, dilation=3)
    x = jnp.asarray(rng.standard_normal((2, 20, 16), dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 20, 16)
    assert np.isfinite(np.asarray(y)).all()
    assert "residual_proj" not in jax.tree_util.tree_leaves_with_path(p)[0]


def test_standalone_grc_channel_change_uses_residual_proj(rng):
    m = StandaloneGRCBlock(in_channels=8, out_channels=16)
    x = jnp.asarray(rng.standard_normal((2, 20, 8), dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 20, 16)
    names = {"/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in jax.tree_util.tree_leaves_with_path(p)}
    assert any("residual_proj" in n for n in names)


def test_parallel_mrf_block(rng):
    m = ParallelMRFBlock(channels=24)
    x = jnp.asarray(rng.standard_normal((2, 16, 24), dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_hokkien_postprocess():
    from hifigan_tpu.eval.asr_bleu import postprocess_hokkien

    assert postprocess_hokkien("Tsia̍h-pá--buē7") == "tsia̍h pá buē"
    assert postprocess_hokkien("a1-b2 c3") == "a b c"


def test_folded_discriminators_exact():
    """folded=True is numerically exact vs the natural layout (both MSD
    time-fold and MPD width-fold with tail masking)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hifigan_tpu.models.discriminators import Discriminators

    wav = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 1000)).astype(np.float32)
    )
    d_ref = Discriminators(folded=False)
    d_fold = Discriminators(folded=True)
    params = d_ref.init(jax.random.PRNGKey(0), wav)
    a = d_ref.apply(params, wav)
    b = d_fold.apply(params, wav)
    for key in ("mpd_outputs", "msd_outputs"):
        for x, y in zip(a[key], b[key]):
            assert x.shape == y.shape
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)
    for key in ("mpd_features", "msd_features"):
        for fx, fy in zip(a[key], b[key]):
            for x, y in zip(fx, fy):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)
