"""Cross-implementation parity: run the ACTUAL reference torch modules
(imported read-only from /root/reference) with weights transplanted into
our flax modules and require matching outputs.

Covered (modules whose reference forward is runnable and whose semantics
we mirror exactly):

* ``GroupedResidualConv1D``  (generator-internal GRC)  ↔ ``GRCLoRABlock``
* ``HiFiGANDiscriminators`` (MPD + MSD)                ↔ ``Discriminators``
* ``FiLMLayer`` (grc_lora.py concat variant)           ↔ ``FiLM``
* ``GRC_LoRA_Block`` (standalone)                      ↔ ``StandaloneGRCBlock``

Not cross-tested (deliberate deviations recorded in SURVEY.md §7 /
README): the reference generator's "upsampling" (its stride-f F.conv1d
downsamples) and its FiLM (adds 192-d + 256-d vectors — a shape error),
and encoders that swap BatchNorm for jit-safe norms.
"""

import importlib.util
import sys

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = "/root/reference/hifigan_modified"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_generator_mod():
    return _load("ref_generator", f"{REF}/generator.py")


@pytest.fixture(scope="module")
def ref_grc_mod():
    return _load("ref_grc_lora", f"{REF}/grc_lora.py")


@pytest.fixture(scope="module")
def ref_disc_mod():
    return _load("ref_discriminators", f"{REF}/discriminators.py")


def t2j_conv1d(w):  # torch [O, I/g, k] -> ours [k, I/g, O]
    return jnp.asarray(w.detach().numpy().transpose(2, 1, 0))


def t2j_conv2d(w):  # torch [O, I, kh, kw] -> ours [kh, kw, I, O]
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j(w):
    return jnp.asarray(w.detach().numpy())


def test_grc_block_matches_reference(rng, ref_generator_mod):
    """Generator-internal GRC: our (algebraically fused) block must match
    the reference's loop-based forward bit-for-tolerance."""
    from hifigan_tpu.models.generator import GRCLoRABlock

    C, k, d = 32, 11, 5
    ref = ref_generator_mod.GroupedResidualConv1D(C, k, dilation=d)
    ref.eval()
    x = rng.standard_normal((2, C, 50)).astype(np.float32)  # torch layout
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    ours = GRCLoRABlock(channels=C, kernel_size=k, dilation=d,
                        groups=4, lora_rank=8)
    params = {"params": {
        "grouped_kernel": t2j_conv1d(ref.grouped_conv.weight),
        "grouped_bias": t2j(ref.grouped_conv.bias),
        "lora_A": t2j(ref.lora_A),
        "lora_B": t2j(ref.lora_B),
        "lora_alpha": t2j(ref.lora_alpha),
        "mixer_kernel": t2j_conv1d(ref.channel_mixer.weight),
        "mixer_bias": t2j(ref.channel_mixer.bias),
        "norm_gamma": t2j(ref.norm.weight),
        "norm_beta": t2j(ref.norm.bias),
    }}
    y = ours.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, rtol=2e-3, atol=2e-3
    )


def test_grc_block_folded_matches_reference(rng, ref_generator_mod):
    """Same, through the time-folded execution path."""
    from hifigan_tpu.models.generator import GRCLoRABlock
    from hifigan_tpu.ops import fold as fold_ops

    C, k, d, F = 32, 3, 1, 4
    ref = ref_generator_mod.GroupedResidualConv1D(C, k, dilation=d)
    ref.eval()
    x = rng.standard_normal((2, C, 64)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    params = {"params": {
        "grouped_kernel": t2j_conv1d(ref.grouped_conv.weight),
        "grouped_bias": t2j(ref.grouped_conv.bias),
        "lora_A": t2j(ref.lora_A),
        "lora_B": t2j(ref.lora_B),
        "lora_alpha": t2j(ref.lora_alpha),
        "mixer_kernel": t2j_conv1d(ref.channel_mixer.weight),
        "mixer_bias": t2j(ref.channel_mixer.bias),
        "norm_gamma": t2j(ref.norm.weight),
        "norm_beta": t2j(ref.norm.bias),
    }}
    ours = GRCLoRABlock(channels=C, kernel_size=k, dilation=d, fold=F)
    xf = fold_ops.fold_time(jnp.asarray(x.transpose(0, 2, 1)), F)
    y = fold_ops.unfold_time(ours.apply(params, xf), F)
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, rtol=2e-3, atol=2e-3
    )


def test_discriminators_match_reference(rng, ref_disc_mod):
    from hifigan_tpu.models.discriminators import Discriminators

    ref = ref_disc_mod.HiFiGANDiscriminators()
    ref.eval()
    real = rng.standard_normal((2, 1, 1000)).astype(np.float32)
    fake = rng.standard_normal((2, 1, 1000)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(real), torch.from_numpy(fake))

    ours = Discriminators()
    params = {"params": {"mpd": {}, "msd": {}}}
    for p, disc in zip(ref.mpd.periods, ref.mpd.discriminators):
        layer = {}
        convs = [m for m in disc.conv_layers if isinstance(m, torch.nn.Conv2d)]
        for i, conv in enumerate(convs):
            layer[f"conv_{i}_kernel"] = t2j_conv2d(conv.weight)
            layer[f"conv_{i}_bias"] = t2j(conv.bias)
        params["params"]["mpd"][f"period_{p}"] = layer
    for s, disc in zip(ref.msd.scales, ref.msd.discriminators):
        layer = {}
        convs = [m for m in disc.conv_layers if isinstance(m, torch.nn.Conv1d)]
        for i, conv in enumerate(convs):
            layer[f"conv_{i}_kernel"] = t2j_conv1d(conv.weight)
            layer[f"conv_{i}_bias"] = t2j(conv.bias)
        params["params"]["msd"][f"scale_{s}"] = layer

    for which, wav in (("real", real), ("fake", fake)):
        out = ours.apply(params, jnp.asarray(wav))
        for i, p in enumerate((2, 3, 5, 7, 11)):
            ref_map = out_ref[f"mpd_{which}"][i].numpy()  # [B, 1, p, T/p]
            our_map = np.asarray(out["mpd_outputs"][i])  # [B, p, T/p, 1]
            np.testing.assert_allclose(
                our_map.transpose(0, 3, 1, 2), ref_map, rtol=2e-3, atol=2e-3
            )
        for i in range(3):
            ref_map = out_ref[f"msd_{which}"][i].numpy()  # [B, 1, T']
            our_map = np.asarray(out["msd_outputs"][i])  # [B, T', 1]
            np.testing.assert_allclose(
                our_map.transpose(0, 2, 1), ref_map, rtol=2e-3, atol=2e-3
            )


def test_film_layer_matches_reference(rng, ref_grc_mod):
    """Reference FiLMLayer (concat variant) vs our FiLM.  Ours produces
    γ = 1 + δ for identity-at-init; transplanting with the γ-half of the
    bias shifted by −1 makes the two computations identical."""
    from hifigan_tpu.models.generator import FiLM

    feat, spk_d, emo_d = 24, 8, 6
    ref = ref_grc_mod.FiLMLayer(feat, spk_d + emo_d)
    ref.eval()
    x = rng.standard_normal((2, feat, 30)).astype(np.float32)
    spk = rng.standard_normal((2, spk_d)).astype(np.float32)
    emo = rng.standard_normal((2, emo_d)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(spk),
                    torch.from_numpy(emo)).numpy()

    kernel = t2j(ref.condition_projection.weight).T  # [cond, 2*feat]
    bias = np.asarray(t2j(ref.condition_projection.bias))
    bias_adj = bias.copy()
    bias_adj[:feat] -= 1.0  # our γ = 1 + proj(cond)
    ours = FiLM(feat)
    params = {"params": {"proj": {"kernel": kernel, "bias": jnp.asarray(bias_adj)}}}
    cond = jnp.concatenate([jnp.asarray(spk), jnp.asarray(emo)], axis=-1)
    y = ours.apply(params, jnp.asarray(x.transpose(0, 2, 1)), cond)
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, rtol=1e-4, atol=1e-4
    )


def test_standalone_grc_matches_reference(rng, ref_grc_mod):
    from hifigan_tpu.models.blocks import StandaloneGRCBlock

    cin = cout = 16
    ref = ref_grc_mod.GRC_LoRA_Block(cin, cout, kernel_size=3, dilation=2, r=4)
    ref.eval()
    x = rng.standard_normal((2, cin, 40)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    ours = StandaloneGRCBlock(in_channels=cin, out_channels=cout,
                              kernel_size=3, dilation=2, lora_rank=4)
    params = {"params": {
        "grouped_kernel": t2j_conv1d(ref.conv.weight),
        "grouped_bias": t2j(ref.conv.bias),
        "lora_A": t2j(ref.lora_A),
        "lora_B": t2j(ref.lora_B),
        "lora_scaling": t2j(ref.lora_scaling),
        "proj_kernel": t2j_conv1d(ref.output_projection.weight),
        "proj_bias": t2j(ref.output_projection.bias),
        "norm_gamma": t2j(ref.norm.weight),
        "norm_beta": t2j(ref.norm.bias),
    }}
    y = ours.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref, rtol=2e-3, atol=2e-3
    )


def test_reference_flagship_generator_unconstructible():
    """Evidence note for the fidelity baseline: the reference's flagship
    generator (and therefore its complete vocoder) CRASHES in its own
    constructor with its own defaults — ``zip(resblock_kernel_sizes,
    resblock_dilation_sizes)`` pairs the int kernel size 3 with the
    dilation tuple and then iterates the int
    (/root/reference/hifigan_modified/generator.py:238-246).  No
    runnable PyTorch reference model exists to compare synthesized
    audio against; this repo implements the *stated* architecture
    (deviation recorded in SURVEY.md §7) and demonstrates fidelity via
    training + held-out copy-synthesis (EVAL_r02.json)."""
    gen_mod = _load("ref_generator_ctor", f"{REF}/generator.py")
    with pytest.raises(TypeError):
        gen_mod.ModifiedHiFiGANGenerator()
