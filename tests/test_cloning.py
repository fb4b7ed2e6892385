"""Voice-cloning substrate tests: parallel-content corpus, labelled
banks, encoder pre-training step, pair sampler, cloning GAN step, and
encoder grafting.  All tiny-sized on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifigan_tpu.train.corpus import (
    PHONES,
    FormantSpeechCorpus,
    plan_phone_ids,
)


def test_parallel_content_alignment():
    """Same content key ⇒ identical plan/length/arousal across speakers,
    but genuinely different waveforms (vocal identity)."""
    c = FormantSpeechCorpus(n_speakers=8)
    wa, plan_a, ar_a = c.utterance(1, 0, content=42, return_plan=True)
    wb, plan_b, ar_b = c.utterance(5, 0, content=42, return_plan=True)
    assert len(wa) == len(wb)
    assert plan_a == plan_b
    assert ar_a == ar_b == c.content_arousal(42)
    corr = np.corrcoef(wa, wb)[0, 1]
    assert corr < 0.8, f"speakers too similar: corr={corr}"
    # legacy path unchanged: content=None reproduces the old seeding
    np.testing.assert_array_equal(c.utterance(3, 7), c.utterance(3, 7))


def test_plan_phone_ids():
    c = FormantSpeechCorpus(n_speakers=4)
    _w, plan, _ar = c.utterance(0, 0, return_plan=True)
    ids = plan_phone_ids(plan)
    assert ids.dtype == np.int32
    assert ids.min() >= 0 and ids.max() < len(PHONES)
    assert ids[-1] == 0  # trailing pau


def _tiny_encoder_cfg():
    from hifigan_tpu.train.encoder_pretrain import EncoderTrainConfig

    return EncoderTrainConfig(
        n_speakers=4, segment_samples=2048, batch_size=4,
        ecapa_channels=32, emo_hidden=32, emo_layers=1, emo_heads=4,
    )


def test_encoder_pretrain_step_runs_and_learns_shapes():
    from hifigan_tpu.train.encoder_pretrain import (
        build_labelled_bank,
        create_encoder_state,
        make_encoder_train_step,
        make_fused_encoder_step,
    )

    cfg = _tiny_encoder_cfg()
    bank, lens, spk, bins = build_labelled_bank(
        n_speakers=4, utterances_per_speaker=2)
    assert bank.shape[0] == 8 and spk.max() == 3
    assert bins.min() >= 0 and bins.max() < 8
    state, ecapa, emo, tx = create_encoder_state(jax.random.PRNGKey(0), cfg)
    step = make_encoder_train_step(
        ecapa, emo, cfg, tx, jnp.asarray(bank), jnp.asarray(lens),
        jnp.asarray(spk), jnp.asarray(bins))
    fused = make_fused_encoder_step(step, 2)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    state, m = fused(state, keys)
    assert int(state.step) == 2
    for k in ("speaker_loss", "speaker_acc", "emotion_loss", "emotion_acc"):
        assert np.isfinite(float(m[k])), k


def test_arousal_bins():
    from hifigan_tpu.train.encoder_pretrain import N_AROUSAL_BINS, arousal_bin

    assert int(arousal_bin(0.2)) == 0
    assert int(arousal_bin(1.0)) == N_AROUSAL_BINS - 1
    assert int(arousal_bin(0.6)) in (N_AROUSAL_BINS // 2 - 1, N_AROUSAL_BINS // 2)
    # monotone over the range
    bins = [int(arousal_bin(a)) for a in np.linspace(0.2, 1.0, 17)]
    assert bins == sorted(bins)


def test_cloning_banks_and_sampler():
    from hifigan_tpu.train.cloning import build_cloning_banks, make_pair_sampler

    content, ref, lengths = build_cloning_banks(n_speakers=3, n_contents=4)
    assert content.shape[:2] == (3, 4) and ref.shape[:2] == (3, 4)
    assert lengths.shape == (4,)
    # parallel rows: same content, different speakers, same true length
    sampler = make_pair_sampler(
        jnp.asarray(lengths), segment_samples=512, ref_samples=512,
        batch_size=3)
    batch = jax.jit(sampler)(jax.random.PRNGKey(0), jnp.asarray(content),
                             jnp.asarray(ref))
    assert batch["input"].shape == (3, 512)
    assert batch["target"].shape == (3, 512)
    assert batch["ref"].shape == (3, 512)


def test_cloning_train_step_updates_and_identity_pairs():
    """One cloning GAN step on the tiny model: params update, metrics
    finite; A=B sampled pairs make input==target (copy-synthesis case)."""
    from dataclasses import replace

    from hifigan_tpu.models.generator import GeneratorConfig
    from hifigan_tpu.ops.stft import MelConfig
    from hifigan_tpu.train import TrainConfig, create_train_state
    from hifigan_tpu.train.cloning import (
        build_cloning_banks,
        make_cloning_train_step,
        make_pair_sampler,
    )

    cfg = TrainConfig(
        generator=GeneratorConfig(
            input_channels=16, hidden_channels=32, upsample_factors=(4, 2),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            lora_rank=4),
        mel=MelConfig(n_fft=32, hop_length=8, win_length=32, n_mels=16),
        warmup_steps=0, decay_steps=100,
        ecapa_channels=32, emo_hidden=32, emo_layers=1, emo_heads=4,
    )
    seg = 256
    state, vocoder, discs = create_train_state(
        jax.random.PRNGKey(0), cfg, mel_frames=seg // cfg.mel.hop_length,
        batch_size=2)
    content, ref, lengths = build_cloning_banks(n_speakers=2, n_contents=2)
    sampler = make_pair_sampler(jnp.asarray(lengths), seg, seg, batch_size=2)
    step = make_cloning_train_step(vocoder, discs, cfg, sampler)
    # copy to host BEFORE the step — the step donates its input state
    before = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]).copy()
    state, m = step(state, jax.random.PRNGKey(3), jnp.asarray(content),
                    jnp.asarray(ref))
    after = np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0])
    assert int(state.step) == 1
    assert not np.allclose(before, after)
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_cloning_identity_loss_metrics_and_gradient():
    """Identity loss: a frozen judge embedder adds identity_loss/
    identity_cos metrics and contributes gradient (params differ from a
    no-identity step on the same key)."""
    from hifigan_tpu.models.embeddings import EcapaTdnn
    from hifigan_tpu.models.generator import GeneratorConfig
    from hifigan_tpu.ops.stft import MelConfig
    from hifigan_tpu.train import TrainConfig, create_train_state
    from hifigan_tpu.train.cloning import (
        build_cloning_banks,
        make_cloning_train_step,
        make_pair_sampler,
    )

    cfg = TrainConfig(
        generator=GeneratorConfig(
            input_channels=16, hidden_channels=32, upsample_factors=(4, 2),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            lora_rank=4),
        mel=MelConfig(n_fft=32, hop_length=8, win_length=32, n_mels=16),
        warmup_steps=0, decay_steps=100,
        ecapa_channels=32, emo_hidden=32, emo_layers=1, emo_heads=4,
    )
    seg = 256
    content, ref, lengths = build_cloning_banks(n_speakers=2, n_contents=2)
    sampler = make_pair_sampler(jnp.asarray(lengths), seg, seg, batch_size=2)
    judge = EcapaTdnn(n_mels=16, channels=32)
    jp = judge.init(jax.random.PRNGKey(9), jnp.zeros((1, 16, 32)))

    def run(identity_weight):
        state, vocoder, discs = create_train_state(
            jax.random.PRNGKey(0), cfg,
            mel_frames=seg // cfg.mel.hop_length, batch_size=2)
        step = make_cloning_train_step(
            vocoder, discs, cfg, sampler,
            identity_fn=(lambda mel: judge.apply(jp, mel)),
            identity_weight=identity_weight)
        state, m = step(state, jax.random.PRNGKey(3),
                        jnp.asarray(content), jnp.asarray(ref))
        return np.asarray(
            jax.tree_util.tree_leaves(state.gen_params)[0]).copy(), m

    p_with, m = run(8.0)
    assert "identity_loss" in m and "identity_cos" in m
    assert np.isfinite(float(m["identity_loss"]))
    assert -1.0 <= float(m["identity_cos"]) <= 1.0
    p_without, m0 = run(0.0)
    assert "identity_loss" not in m0
    assert not np.allclose(p_with, p_without)


def test_graft_into_extractor_swaps_subtrees():
    from hifigan_tpu.train.encoder_pretrain import (
        build_labelled_bank,  # noqa: F401 (import check)
        create_encoder_state,
        graft_into_extractor,
        strip_classifier,
    )
    from dataclasses import replace

    from hifigan_tpu.models.generator import GeneratorConfig
    from hifigan_tpu.ops.stft import MelConfig
    from hifigan_tpu.train import TrainConfig, create_train_state
    from hifigan_tpu.train.encoder_pretrain import EncoderTrainConfig

    # matching tiny dims between facade extractor and standalone encoders
    ecfg = EncoderTrainConfig(
        n_speakers=4, segment_samples=2048, batch_size=2,
        ecapa_channels=32, emo_hidden=32, emo_layers=1, emo_heads=4,
        mel=MelConfig(n_fft=32, hop_length=8, win_length=32, n_mels=16),
    )
    # standalone encoders default to n_mels=80; build with 16 via models
    from hifigan_tpu.models.embeddings import EcapaTdnn, Emotion2Vec

    ecapa = EcapaTdnn(n_mels=16, channels=32, num_speakers=4)
    emo = Emotion2Vec(n_mels=16, hidden_dim=32, num_layers=1, num_heads=4)
    ep = ecapa.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 8)), train=True)
    mp = emo.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 8)), train=True)
    assert "classifier" in ep["params"]
    assert "classifier" not in strip_classifier(ep)["params"]

    cfg = TrainConfig(
        generator=GeneratorConfig(
            input_channels=16, hidden_channels=32, upsample_factors=(4, 2),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            lora_rank=4),
        mel=MelConfig(n_fft=32, hop_length=8, win_length=32, n_mels=16),
        ecapa_channels=32, emo_hidden=32, emo_layers=1, emo_heads=4,
    )
    state, vocoder, _ = create_train_state(
        jax.random.PRNGKey(2), cfg, mel_frames=16, batch_size=1)
    grafted = graft_into_extractor(state.gen_params, ep, mp)
    ext = grafted["params"]["embedding_extractor"]
    np.testing.assert_array_equal(
        np.asarray(ext["ecapa"]["stem_kernel"]),
        np.asarray(ep["params"]["stem_kernel"]))
    assert "classifier" not in ext["ecapa"]
    # grafted tree still works end-to-end (forward with reference_mel)
    mel = jnp.zeros((1, 16, 16))
    ref = jnp.ones((1, 16, 24))
    out = vocoder.apply(grafted, mel, reference_mel=ref)
    assert out["waveform"].shape[0] == 1


def test_reference_mel_routes_extractor():
    """Embeddings must come from reference_mel, not the content mel."""
    from hifigan_tpu.models.generator import GeneratorConfig
    from hifigan_tpu.models.vocoder import ModifiedVocoder

    cfg = GeneratorConfig(
        input_channels=16, hidden_channels=32, upsample_factors=(4, 2),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        lora_rank=4)
    voc = ModifiedVocoder(cfg, ecapa_channels=32, emo_hidden=32,
                          emo_layers=1, emo_heads=4)
    mel = jnp.linspace(0, 1, 16 * 16).reshape(1, 16, 16)
    ref1 = jnp.zeros((1, 16, 24))
    ref2 = jnp.ones((1, 16, 24))
    params = voc.init(jax.random.PRNGKey(0), mel)
    o1 = voc.apply(params, mel, reference_mel=ref1)
    o2 = voc.apply(params, mel, reference_mel=ref2)
    o_self = voc.apply(params, mel)
    # different reference ⇒ different embeddings ⇒ different waveform
    assert not np.allclose(np.asarray(o1["speaker_embedding"]),
                           np.asarray(o2["speaker_embedding"]))
    assert not np.allclose(np.asarray(o1["waveform"]),
                           np.asarray(o2["waveform"]))
    # no reference ⇒ embeddings from the content mel itself (legacy)
    assert not np.allclose(np.asarray(o_self["speaker_embedding"]),
                           np.asarray(o1["speaker_embedding"]))


def test_cloning_identity_centroid_hinge():
    """Centroid-hinge identity loss (round 5): cosine is measured against
    per-speaker centroids via the sampled target-speaker index, the hinge
    zeroes gradient above the margin, and metrics stay finite."""
    from hifigan_tpu.models.embeddings import EcapaTdnn
    from hifigan_tpu.models.generator import GeneratorConfig
    from hifigan_tpu.ops.stft import MelConfig
    from hifigan_tpu.train import TrainConfig, create_train_state
    from hifigan_tpu.train.cloning import (
        build_cloning_banks,
        make_cloning_train_step,
        make_pair_sampler,
    )

    cfg = TrainConfig(
        generator=GeneratorConfig(
            input_channels=16, hidden_channels=32, upsample_factors=(4, 2),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            lora_rank=4),
        mel=MelConfig(n_fft=32, hop_length=8, win_length=32, n_mels=16),
        warmup_steps=0, decay_steps=100,
        ecapa_channels=32, emo_hidden=32, emo_layers=1, emo_heads=4,
    )
    seg = 256
    content, ref, lengths = build_cloning_banks(n_speakers=2, n_contents=2)
    sampler = make_pair_sampler(jnp.asarray(lengths), seg, seg, batch_size=2)
    # sampler must expose the target-speaker index for the centroid gather
    batch = sampler(jax.random.PRNGKey(0), jnp.asarray(content),
                    jnp.asarray(ref))
    assert batch["tgt_spk"].shape == (2,)
    judge = EcapaTdnn(n_mels=16, channels=32)
    jp = judge.init(jax.random.PRNGKey(9), jnp.zeros((1, 16, 32)))
    emb_dim = judge.apply(jp, jnp.zeros((1, 16, 32))).shape[-1]
    cents = jnp.eye(2, emb_dim)  # unit-norm per-speaker centroids

    def run(margin):
        state, vocoder, discs = create_train_state(
            jax.random.PRNGKey(0), cfg,
            mel_frames=seg // cfg.mel.hop_length, batch_size=2)
        step = make_cloning_train_step(
            vocoder, discs, cfg, sampler,
            identity_fn=(lambda mel: judge.apply(jp, mel)),
            identity_weight=8.0, identity_centroids=cents,
            identity_margin=margin)
        state, m = step(state, jax.random.PRNGKey(3),
                        jnp.asarray(content), jnp.asarray(ref))
        return m

    m = run(0.8)
    assert np.isfinite(float(m["identity_loss"]))
    assert -1.0 <= float(m["identity_cos"]) <= 1.0
    # a margin below any attainable cosine zeroes the hinge exactly
    m_low = run(-1.0)
    assert float(m_low["identity_loss"]) == 0.0


def test_cloning_identity_finetune_freezes_trunk():
    """identity_finetune must update ONLY the conditioning pathway
    (embedding extractor + FiLM) and leave the synthesis trunk bit-
    identical (round 4's full-model identity run destroyed eval
    verification; the trunk freeze makes that impossible)."""
    from hifigan_tpu.models.embeddings import EcapaTdnn
    from hifigan_tpu.models.generator import GeneratorConfig
    from hifigan_tpu.ops.stft import MelConfig
    from hifigan_tpu.train import TrainConfig, create_train_state
    from hifigan_tpu.train.cloning import (
        build_cloning_banks,
        make_cloning_train_step,
        make_pair_sampler,
    )

    cfg = TrainConfig(
        generator=GeneratorConfig(
            input_channels=16, hidden_channels=32, upsample_factors=(4, 2),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            lora_rank=4),
        mel=MelConfig(n_fft=32, hop_length=8, win_length=32, n_mels=16),
        warmup_steps=0, decay_steps=100,
        ecapa_channels=32, emo_hidden=32, emo_layers=1, emo_heads=4,
    )
    seg = 256
    content, ref, lengths = build_cloning_banks(n_speakers=2, n_contents=2)
    sampler = make_pair_sampler(jnp.asarray(lengths), seg, seg, batch_size=2)
    judge = EcapaTdnn(n_mels=16, channels=32)
    jp = judge.init(jax.random.PRNGKey(9), jnp.zeros((1, 16, 32)))
    emb_dim = judge.apply(jp, jnp.zeros((1, 16, 32))).shape[-1]
    state, vocoder, discs = create_train_state(
        jax.random.PRNGKey(0), cfg,
        mel_frames=seg // cfg.mel.hop_length, batch_size=2)
    step = make_cloning_train_step(
        vocoder, discs, cfg, sampler,
        identity_fn=(lambda mel: judge.apply(jp, mel)),
        identity_weight=8.0, identity_centroids=jnp.eye(2, emb_dim),
        identity_finetune=True)
    import jax.tree_util as jtu

    # the jitted step donates the input state: snapshot to host first
    old_params = jtu.tree_map(lambda x: np.asarray(x).copy(),
                              state.gen_params)
    new_state, m = step(state, jax.random.PRNGKey(3),
                        jnp.asarray(content), jnp.asarray(ref))
    changed_cond = changed_trunk = 0
    for (path, old), (_, new) in zip(
            jtu.tree_leaves_with_path(old_params),
            jtu.tree_leaves_with_path(new_state.gen_params)):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        moved = not np.array_equal(np.asarray(old), np.asarray(new))
        if "embedding_extractor" in keys or "film_" in keys:
            changed_cond += moved
        else:
            assert not moved, f"trunk param {keys} moved under finetune"
            changed_trunk += moved
    assert changed_cond > 0  # the conditioning pathway actually trains
    assert changed_trunk == 0
