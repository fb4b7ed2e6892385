"""StreamSpeech S2ST composition tests (tiny config), mirroring the
reference smoke block (/root/reference/streamspeech_integration.py:416-459):
full forward incl. text decoder + a chunk streaming_forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifigan_tpu.models.streamspeech import StreamSpeechConfig, StreamSpeechS2ST
from hifigan_tpu.models.layers import chunk_mask

TINY = StreamSpeechConfig(
    input_dim=16,
    hidden_dim=32,
    encoder_layers=2,
    decoder_layers=2,
    num_heads=4,
    vocab_size=100,
    unit_vocab_size=50,
    chunk_size=8,
    vocoder_hidden=32,
    vocoder_upsample=(4, 2),
    ecapa_channels=32,
    emo_hidden=32,
    emo_layers=1,
)


@pytest.fixture(scope="module")
def sys_setup():
    model = StreamSpeechS2ST(TINY)
    rng = jax.random.PRNGKey(0)
    mel = jnp.zeros((2, 24, 16))  # [B, T, n_mels] streamspeech layout
    tgt = jnp.zeros((2, 12), jnp.int32)
    params = model.init(rng, mel, tgt)
    return model, params


def test_full_forward_all_outputs(sys_setup, rng):
    model, params = sys_setup
    mel = jnp.asarray(rng.standard_normal((2, 24, 16), dtype=np.float32))
    tgt = jnp.asarray(rng.integers(0, 100, (2, 12)), dtype=jnp.int32)
    out = model.apply(params, mel, tgt)
    assert out["encoder_outputs"].shape == (2, 24, 32)
    assert out["source_ctc_logits"].shape == (2, 24, 100)
    assert out["target_ctc_logits"].shape == (2, 24, 100)
    assert out["text_logits"].shape == (2, 12, 100)
    assert out["unit_logits"].shape == (2, 24 * 8, 50)  # 8x T2U upsampling
    assert out["generated_waveform"].shape == (2, 1, 24 * 8)  # vocoder 8x (4*2)
    assert out["speaker_embedding"].shape == (2, 192)
    assert out["emotion_embedding"].shape == (2, 256)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_streaming_forward_chunk(sys_setup, rng):
    model, params = sys_setup
    chunk = jnp.asarray(rng.standard_normal((2, 8, 16), dtype=np.float32))
    out = model.apply(params, chunk, method=StreamSpeechS2ST.streaming_forward)
    assert out["encoder_outputs"].shape == (2, 8, 32)
    assert out["generated_waveform"].shape == (2, 1, 64)
    assert "text_logits" not in out


def test_chunked_attention_is_causal_across_chunks(sys_setup, rng):
    """Chunked encoding of a prefix must equal the prefix of chunked
    encoding of the full sequence (information never flows backward
    across chunk boundaries) — the property the streaming policy relies
    on (reference chunk_mask threading, streamspeech_integration.py:43-66)."""
    model, params = sys_setup
    mel = jnp.asarray(rng.standard_normal((1, 24, 16), dtype=np.float32))
    full = model.apply(params, mel, method=StreamSpeechS2ST.streaming_forward)
    prefix = model.apply(params, mel[:, :16], method=StreamSpeechS2ST.streaming_forward)
    np.testing.assert_allclose(
        np.asarray(full["encoder_outputs"])[:, :16],
        np.asarray(prefix["encoder_outputs"]),
        rtol=2e-3, atol=2e-3,
    )


def test_causal_text_decoder(sys_setup, rng):
    """Changing a later target token must not affect earlier logits."""
    model, params = sys_setup
    mel = jnp.asarray(rng.standard_normal((1, 16, 16), dtype=np.float32))
    tgt = jnp.asarray(rng.integers(0, 100, (1, 10)), dtype=jnp.int32)
    out1 = model.apply(params, mel, tgt)["text_logits"]
    tgt2 = tgt.at[0, -1].set((int(tgt[0, -1]) + 1) % 100)
    out2 = model.apply(params, mel, tgt2)["text_logits"]
    np.testing.assert_allclose(
        np.asarray(out1)[:, :-1], np.asarray(out2)[:, :-1], rtol=1e-4, atol=1e-5
    )


def test_chunk_mask_structure():
    m = np.asarray(chunk_mask(8, 4)[0, 0])
    assert m[0, 3]  # within first chunk: attends
    assert not m[0, 4]  # next chunk: masked
    assert m[7, 0]  # later chunk sees all earlier
