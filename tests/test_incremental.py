"""KV-cached incremental decoding == full causal re-decode.

Covers VERDICT round-1 item #3: per-token decode cost independent of
prefix length, with fairseq-style cache retention/pruning
(``/root/reference/agent/sequence_generator.py:93-99, 165-194``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifigan_tpu.models.streamspeech import SimultaneousTextDecoder
from hifigan_tpu.streaming import incremental as inc

HID, HEADS, LAYERS, VOCAB, MAXLEN = 32, 4, 2, 50, 24


@pytest.fixture(scope="module")
def decoder():
    model = SimultaneousTextDecoder(HID, VOCAB, LAYERS, HEADS)
    mem = jax.random.normal(jax.random.PRNGKey(0), (1, 12, HID))
    tokens = jnp.zeros((1, MAXLEN), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), mem, tokens)
    spec = inc.DecoderSpec(LAYERS, HEADS, HID, VOCAB)
    return model, params["params"], params, mem, spec


def test_prefill_matches_full_forward(decoder):
    model, p, variables, mem, spec = decoder
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, MAXLEN), 0, VOCAB)
    full = model.apply(variables, mem, tokens)
    ckv = inc.cross_kv(p, spec, mem)
    cache = inc.init_cache(spec, 1, MAXLEN)
    logits, cache = inc.prefill(p, spec, ckv, tokens, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full), atol=2e-4)


def test_decode_step_matches_full_forward(decoder):
    model, p, variables, mem, spec = decoder
    seq = [1, 7, 3, 19, 4]
    ckv = inc.cross_kv(p, spec, mem)
    cache = inc.init_cache(spec, 1, MAXLEN)
    step = jax.jit(lambda c, t: inc.decode_step(p, spec, ckv, c, t))
    inc_logits = []
    for tok in seq:
        logits, cache = step(cache, jnp.asarray([tok], jnp.int32))
        inc_logits.append(np.asarray(logits)[0])
    assert int(cache.index) == len(seq)

    tokens = np.zeros((1, MAXLEN), np.int32)
    tokens[0, : len(seq)] = seq
    full = np.asarray(model.apply(variables, mem, jnp.asarray(tokens)))
    for i in range(len(seq)):
        np.testing.assert_allclose(inc_logits[i], full[0, i], atol=2e-4)


def test_retraction_prune(decoder):
    """Lowering the index then re-writing reproduces the clean decode."""
    model, p, variables, mem, spec = decoder
    ckv = inc.cross_kv(p, spec, mem)
    step = jax.jit(lambda c, t: inc.decode_step(p, spec, ckv, c, t))
    cache = inc.init_cache(spec, 1, MAXLEN)
    for tok in [1, 5, 9, 13]:
        out_a, cache = step(cache, jnp.asarray([tok], jnp.int32))
    # retract the last two tokens, decode a different continuation
    cache = inc.with_index(cache, 2)
    out_b, cache = step(cache, jnp.asarray([4], jnp.int32))

    clean = inc.init_cache(spec, 1, MAXLEN)
    for tok in [1, 5]:
        _, clean = step(clean, jnp.asarray([tok], jnp.int32))
    out_c, clean = step(clean, jnp.asarray([4], jnp.int32))
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c), atol=1e-5)


def test_beam_gather(decoder):
    model, p, variables, mem, spec = decoder
    mem3 = jnp.broadcast_to(mem, (3,) + mem.shape[1:])
    ckv = inc.cross_kv(p, spec, mem3)
    cache = inc.init_cache(spec, 3, MAXLEN)
    toks = jnp.asarray([3, 4, 5], jnp.int32)
    _, cache = inc.decode_step(p, spec, ckv, cache, toks)
    reordered = inc.gather_beams(cache, jnp.asarray([2, 0, 0]))
    np.testing.assert_allclose(
        np.asarray(reordered.k[:, 0]), np.asarray(cache.k[:, 2])
    )
    np.testing.assert_allclose(
        np.asarray(reordered.k[:, 1]), np.asarray(cache.k[:, 0])
    )


def test_per_token_cost_independent_of_prefix():
    """The incremental step is ONE compiled program regardless of how
    many tokens precede it (the round-1 path re-ran an O(L²) full decode
    per token)."""
    model = SimultaneousTextDecoder(HID, VOCAB, LAYERS, HEADS)
    mem = jax.random.normal(jax.random.PRNGKey(0), (1, 12, HID))
    variables = model.init(jax.random.PRNGKey(1), mem, jnp.zeros((1, MAXLEN), jnp.int32))
    spec = inc.DecoderSpec(LAYERS, HEADS, HID, VOCAB)
    p = variables["params"]
    ckv = inc.cross_kv(p, spec, mem)

    traces = []

    def counted(cache, tok):
        traces.append(1)
        return inc.decode_step(p, spec, ckv, cache, tok)

    step = jax.jit(counted)
    cache = inc.init_cache(spec, 1, MAXLEN)
    for tok in range(1, 15):
        _, cache = step(cache, jnp.asarray([tok % VOCAB], jnp.int32))
    assert len(traces) == 1, "decode_step retraced — prefix length leaked into shapes"


def test_kv_beam_matches_full_beam():
    """continue_text_beam KV path == full-recompute path (VERDICT r2
    item 6: beam decode through prefill/decode_step/gather_beams)."""
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.models.code_vocoder import CodeVocoder, CodeVocoderConfig
    from hifigan_tpu.models.streamspeech import (
        StreamSpeechConfig,
        StreamSpeechS2ST,
    )
    from hifigan_tpu.streaming.runtime import S2STInference, S2STInferenceConfig

    cfg = StreamSpeechConfig(
        input_dim=80, hidden_dim=32, encoder_layers=1, decoder_layers=2,
        num_heads=4, vocab_size=30, unit_vocab_size=50, chunk_size=8,
        vocoder_hidden=32, vocoder_upsample=(4, 2),
        ecapa_channels=32, emo_hidden=32, emo_layers=1,
    )
    model = StreamSpeechS2ST(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)),
                        jnp.zeros((1, 8), jnp.int32))
    inf = S2STInference(
        model, params, cfg=S2STInferenceConfig(
            source_buckets=(32,), max_target_len=24, max_new_tokens=6))
    enc = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 32))
    for prefix in ([], [5, 9], [7, 3, 11, 2][:3]):
        full = inf.continue_text_beam(enc, prefix, beam_size=3,
                                      max_new_tokens=5, kv_cached=False)
        kv = inf.continue_text_beam(enc, prefix, beam_size=3,
                                    max_new_tokens=5, kv_cached=True)
        assert kv == full, (prefix, kv, full)


def _tiny_inf(decoder_layers=1):
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.models.streamspeech import (
        StreamSpeechConfig,
        StreamSpeechS2ST,
    )
    from hifigan_tpu.streaming.runtime import S2STInference, S2STInferenceConfig

    cfg = StreamSpeechConfig(
        input_dim=80, hidden_dim=32, encoder_layers=1,
        decoder_layers=decoder_layers, num_heads=4, vocab_size=30,
        unit_vocab_size=50, chunk_size=8, vocoder_hidden=32,
        vocoder_upsample=(4, 2), ecapa_channels=32, emo_hidden=32,
        emo_layers=1)
    model = StreamSpeechS2ST(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)),
                        jnp.zeros((1, 8), jnp.int32), decoder_units_out=True)
    return S2STInference(model, params, cfg=S2STInferenceConfig(
        source_buckets=(32,), max_target_len=24, max_new_tokens=6))


def test_hmt_kv_matches_full_single_layer():
    """With a 1-layer decoder the cached prefix states carry no
    cross-attention dependence, so the KV-cached HMT path must match the
    full-recompute path exactly (tokens and reads)."""
    import jax

    inf = _tiny_inf(decoder_layers=1)
    enc = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 32))
    for src_len, fin in ((8, False), (16, True)):
        full = inf.continue_text_hmt(
            enc, [], src_len=src_len, source_finished=fin,
            max_new_tokens=4, kv_cached=False)
        kv = inf.continue_text_hmt(
            enc, [], src_len=src_len, source_finished=fin,
            max_new_tokens=4, kv_cached=True)
        fb, kb = full.best(), kv.best()
        assert fb.tokens == kb.tokens, (src_len, fin, fb.tokens, kb.tokens)
        assert fb.reads == kb.reads


def test_hmt_kv_runs_multilayer_and_learned():
    """Multi-layer + learned-transition KV path executes and is
    resumable across policy calls."""
    import jax

    inf = _tiny_inf(decoder_layers=2)
    enc = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 32))
    st = inf.continue_text_hmt(enc, [], src_len=8, source_finished=False,
                               max_new_tokens=3, kv_cached=True,
                               transition="learned")
    st2 = inf.continue_text_hmt(enc, [], src_len=16, source_finished=True,
                                state=st, max_new_tokens=3, kv_cached=True,
                                transition="learned")
    assert st2.best() is not None
