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


# --------------------------------------------------------------------------
# HMT-class simultaneous beam (reference hmt_sim_sequence_generator.py)
# --------------------------------------------------------------------------

BOS, EOS, VOCAB = 1, 2, 32
TGT = [11, 14, 17, 13, 19]          # correct target sequence
DECOY = [21, 24, 27, 23, 29]        # what a premature policy writes


def _oracle_score_fn(lookahead=2):
    """Synthetic simultaneous-MT oracle: the correct token for target
    position t is only predictable once ``read >= t + lookahead``;
    with less source read, a decoy looks mildly confident."""

    def score(tokens, read_lens):
        N, L = tokens.shape
        out = np.full((N, L, VOCAB), np.log(0.001), np.float32)
        for n in range(N):
            r = int(read_lens[n])
            for pos in range(L):
                t = pos  # position `pos` scores target index `pos`
                if t < len(TGT):
                    if r >= t + lookahead:
                        out[n, pos, TGT[t]] = np.log(0.9)
                    else:
                        out[n, pos, DECOY[t]] = np.log(0.55)
                        out[n, pos, TGT[t]] = np.log(0.05)
                else:
                    out[n, pos, EOS] = np.log(0.95)
        return out

    return score


def test_hmt_beam_beats_greedy_waitk():
    from hifigan_tpu.streaming.beam import hmt_beam_search

    score = _oracle_score_fn()
    src_len = len(TGT) + 2

    # wait-1 greedy: always writes from the minimal read prefix
    greedy = []
    for t in range(len(TGT)):
        tokens = np.zeros((1, 16), np.int32)
        tokens[0, 0] = BOS
        tokens[0, 1:1 + t] = greedy[:t]
        lp = score(tokens, np.array([t + 1]))[0, t]
        greedy.append(int(lp.argmax()))
    assert greedy == DECOY  # premature commitment

    state = hmt_beam_search(
        score, prefix=[], src_len=src_len, source_finished=True,
        beam_size=3, cands_per_token=4, max_new_tokens=10, max_len=16,
        bos_id=BOS, eos_id=EOS, write_threshold=0.6,
    )
    best = state.best()
    toks = best.tokens[:-1] if best.tokens and best.tokens[-1] == EOS else best.tokens
    assert toks == TGT  # adaptive reads recover the true sequence
    # reads are monotone and actually waited for the needed lookahead
    assert all(b <= a for b, a in zip(best.reads, best.reads[1:]))
    assert best.reads[0] >= 2


def test_hmt_beam_resumes_across_policy_calls():
    from hifigan_tpu.streaming.beam import hmt_beam_search

    score = _oracle_score_fn()

    # only 3 source positions arrived: can confidently write TGT[0]
    # (needs read>=2) and TGT[1] (needs read>=3), then must request READ
    st = hmt_beam_search(
        score, prefix=[], src_len=3, source_finished=False,
        beam_size=2, cands_per_token=4, max_new_tokens=10, max_len=16,
        bos_id=BOS, eos_id=EOS, write_threshold=0.6,
    )
    assert st.need_read
    emitted = st.best().tokens
    assert emitted == TGT[:2]

    # rest of the source arrives → resume the SAME state to completion
    st2 = hmt_beam_search(
        score, prefix=[], src_len=len(TGT) + 2, source_finished=True,
        state=st, beam_size=2, cands_per_token=4, max_new_tokens=10,
        max_len=16, bos_id=BOS, eos_id=EOS, write_threshold=0.6,
    )
    best = st2.best()
    toks = best.tokens[:-1] if best.tokens[-1] == EOS else best.tokens
    assert toks == TGT


def test_hmt_eos_suppressed_until_source_finished():
    from hifigan_tpu.streaming.beam import hmt_beam_search

    score = _oracle_score_fn(lookahead=0)  # everything predictable
    st = hmt_beam_search(
        score, prefix=list(TGT), src_len=len(TGT) + 2,
        source_finished=False, beam_size=2, max_new_tokens=4, max_len=16,
        bos_id=BOS, eos_id=EOS,
    )
    assert all(EOS not in h.tokens for h in st.beams + st.finished)
