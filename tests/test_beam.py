"""Beam search + waveform-encoder tests."""

import numpy as np
import pytest

from hifigan_tpu.streaming.beam import (
    BeamHypothesis,
    beam_search,
    partial_encoder_mask,
)


def _toy_score_fn(transition_logits):
    """Markov-chain scorer: next-token logits depend on current token."""
    V = transition_logits.shape[0]

    def score(tokens):
        N, L = tokens.shape
        out = np.full((N, L, V), -1e9, np.float32)
        for n in range(N):
            for l in range(L):
                logits = transition_logits[tokens[n, l] % V]
                out[n, l] = logits - np.log(np.exp(logits).sum())
        return out

    return score


def test_beam_finds_higher_probability_path():
    # chain where greedy takes a locally-best token leading to a
    # high-entropy state (poor continuation probability)
    V = 5
    T = np.full((V, V), -10.0, np.float32)
    T[1, 3] = 2.0   # from BOS(1): token 3 slightly better...
    T[1, 4] = 1.9   # ...than token 4
    T[3] = 0.0      # but from 3 everything is equally likely (flat)
    T[3, 2] = 0.1   # (EOS marginally best so greedy terminates there)
    T[4, 2] = 3.0   # while 4 reaches EOS with high confidence
    score = _toy_score_fn(T)
    greedy = beam_search(score, prefix=[], beam_size=1, max_new_tokens=3,
                         max_len=8, bos_id=1, eos_id=2)
    wide = beam_search(score, prefix=[], beam_size=3, max_new_tokens=3,
                       max_len=8, bos_id=1, eos_id=2)
    assert greedy[0].tokens[0] == 3
    assert wide[0].tokens[0] == 4  # beam recovers the better global path
    assert wide[0].tokens[-1] == 2
    assert wide[0].score > greedy[0].score


def test_beam_prefix_continuation():
    V = 5
    T = np.full((V, V), -10.0, np.float32)
    T[3, 4] = 5.0
    T[4, 2] = 5.0
    score = _toy_score_fn(T)
    hyps = beam_search(score, prefix=[3], beam_size=2, max_new_tokens=2,
                       max_len=8, bos_id=1, eos_id=2)
    assert hyps[0].tokens == [4, 2]  # continuation only, not the prefix


def test_partial_encoder_mask():
    m = partial_encoder_mask(10, 4)
    assert m.shape == (1, 1, 1, 10)
    assert m[..., :4].all() and not m[..., 4:].any()


def test_runtime_beam_matches_greedy_when_beam1(rng):
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.models.streamspeech import StreamSpeechConfig, StreamSpeechS2ST
    from hifigan_tpu.streaming.runtime import S2STInference, S2STInferenceConfig

    cfg = StreamSpeechConfig(
        input_dim=16, hidden_dim=32, encoder_layers=1, decoder_layers=1,
        num_heads=4, vocab_size=30, unit_vocab_size=20, chunk_size=8,
        vocoder_hidden=32, vocoder_upsample=(4, 2),
        ecapa_channels=32, emo_hidden=32, emo_layers=1,
    )
    model = StreamSpeechS2ST(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)),
                        jnp.zeros((1, 8), jnp.int32))
    inf = S2STInference(model, params, cfg=S2STInferenceConfig(
        source_buckets=(16, 32), max_target_len=12, max_new_tokens=3))
    mel = rng.standard_normal((16, 16)).astype(np.float32)
    enc = inf.encode_prefix(mel)["enc"]
    greedy = inf.continue_text(enc, [], max_new_tokens=3)
    beam1 = inf.continue_text_beam(enc, [], beam_size=1, max_new_tokens=3)
    # beam-1 must follow the same greedy path (modulo EOS bookkeeping)
    n = min(len(greedy), len(beam1))
    assert greedy[:n] == beam1[:n]


def test_waveform_encoders(rng):
    from hifigan_tpu.models.waveform_encoders import (
        SpeakerEncoder,
        Wav2Vec2Emotion,
        calculate_speaker_similarity,
        extract_mel_features,
        verify_speaker_identity,
    )

    audio = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    mel = extract_mel_features(audio)
    assert mel.shape[1] == 80 and np.isfinite(mel).all()

    enc = SpeakerEncoder()
    assert enc.backend == "native"  # no speechbrain in this image
    e1 = enc(audio)
    assert e1.shape == (192,)
    np.testing.assert_allclose(np.linalg.norm(e1), 1.0, rtol=1e-4)
    e2 = enc((rng.standard_normal(8000) * 0.3).astype(np.float32))
    same, sim = verify_speaker_identity(e1, e1)
    assert same and sim > 0.99
    assert calculate_speaker_similarity(e1, e2) < 1.0

    emo = Wav2Vec2Emotion()
    out = emo(audio)
    assert out["embedding"].shape == (384,)
    assert out["logits"].shape[-1] == 8
    assert out["label"] in (
        "neutral", "happy", "sad", "angry",
        "fearful", "disgusted", "surprised", "excited",
    )
