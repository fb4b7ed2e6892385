"""Embedding encoder tests (ECAPA-TDNN, Emotion2Vec, combined extractor),
mirroring the reference smoke block (/root/reference/embedding_extractors.py:286-315)
with real assertions."""

import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.models.embeddings import (
    EcapaTdnn,
    Emotion2Vec,
    EmbeddingExtractor,
    SEModule,
)


def test_ecapa_shapes_and_norm(rng):
    m = EcapaTdnn(channels=64, embedding_dim=192)
    mel = jnp.asarray(rng.standard_normal((2, 80, 50), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), mel)
    emb = m.apply(params, mel)
    assert emb.shape == (2, 192)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-4)
    # different inputs -> different embeddings
    mel2 = jnp.asarray(rng.standard_normal((2, 80, 50), dtype=np.float32))
    emb2 = m.apply(params, mel2)
    assert np.abs(np.asarray(emb) - np.asarray(emb2)).max() > 1e-4


def test_ecapa_classifier_head(rng):
    m = EcapaTdnn(channels=32, embedding_dim=64, num_speakers=10)
    mel = jnp.asarray(rng.standard_normal((2, 80, 30), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), mel, train=True)
    emb, logits = m.apply(params, mel, train=True)
    assert emb.shape == (2, 64) and logits.shape == (2, 10)


def test_emotion2vec_shapes(rng):
    m = Emotion2Vec(hidden_dim=64, num_layers=2, num_heads=4, embedding_dim=256)
    mel = jnp.asarray(rng.standard_normal((2, 80, 40), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), mel, train=True)  # create all heads
    utt = m.apply(params, mel)
    assert utt.shape == (2, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(utt), axis=-1), 1.0, rtol=1e-4)
    utt2, frames = m.apply(params, mel, return_frames=True)
    assert frames.shape == (2, 40, 256)
    utt3, logits = m.apply(params, mel, train=True)
    assert logits.shape == (2, 8)  # 8 emotion classes (reference :42-45)


def test_combined_extractor(rng):
    m = EmbeddingExtractor(ecapa_channels=32, emo_hidden=32, emo_layers=1, emo_heads=4)
    mel = jnp.asarray(rng.standard_normal((2, 80, 30), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), mel)
    spk, emo = m.apply(params, mel)
    assert spk.shape == (2, 192) and emo.shape == (2, 256)


def test_se_module_gates(rng):
    m = SEModule(channels=16, bottleneck=8)
    x = jnp.asarray(rng.standard_normal((2, 10, 16), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
