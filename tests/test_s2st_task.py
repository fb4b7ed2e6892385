"""StreamSpeech multitask training task: toy translation semantics,
paired-bank construction, fbank parity with the streaming extractor,
and one multitask train step on a tiny model."""

import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.train.corpus import FormantSpeechCorpus, plan_phone_ids
from hifigan_tpu.train.s2st_task import (
    BOS,
    EOS,
    TOKEN_OFFSET,
    S2STTaskConfig,
    batched_fbank,
    build_s2st_bank,
    create_s2st_state,
    make_s2st_train_step,
    small_config,
    source_tokens,
    target_units,
    token_f1,
    translate,
)


def test_translation_is_deterministic_word_reversal():
    # word [a b] pau word [c] → reversed per word, permuted
    ids = np.array([3, 5, 0, 7], np.int32)
    out = translate(ids)
    assert len(out) == 3
    again = translate(ids)
    np.testing.assert_array_equal(out, again)
    # reversal: first word's tokens come out reversed
    from hifigan_tpu.train.s2st_task import _PERM

    assert out[0] == TOKEN_OFFSET + _PERM[5] - 1
    assert out[1] == TOKEN_OFFSET + _PERM[3] - 1
    assert out[2] == TOKEN_OFFSET + _PERM[7] - 1
    # tokens stay in vocab (>= TOKEN_OFFSET, no collisions with specials)
    assert out.min() >= TOKEN_OFFSET


def test_source_tokens_drop_pau():
    ids = np.array([0, 3, 0, 0, 5, 0], np.int32)
    toks = source_tokens(ids)
    np.testing.assert_array_equal(toks, [TOKEN_OFFSET + 2, TOKEN_OFFSET + 4])


def test_units_match_translation():
    c = FormantSpeechCorpus(n_speakers=4)
    _w, plan, _a = c.utterance(0, 0, return_plan=True)
    ids = plan_phone_ids(plan)
    u = target_units(ids)
    t = translate(ids)
    np.testing.assert_array_equal(u, t - TOKEN_OFFSET + 1)
    assert u.min() >= 1  # 0 is the unit blank


def test_bank_shapes_and_consistency():
    cfg = S2STTaskConfig(n_utterances=6, n_speakers=3, batch_size=2,
                         max_seconds=5.0)
    bank = build_s2st_bank(cfg)
    assert bank["audio"].shape == (6, cfg.n_samples)
    assert (bank["n_frames"] > 10).all()
    for i in range(6):
        n_src = int((bank["src_pad"][i] == 0).sum())
        n_tgt = int((bank["tgt_pad"][i] == 0).sum())
        assert n_src > 0 and n_tgt > 0
        # decoder teacher-forcing layout: BOS + tgt ↔ tgt + EOS
        assert bank["dec_in"][i, 0] == BOS
        np.testing.assert_array_equal(bank["dec_in"][i, 1 : n_tgt + 1],
                                      bank["tgt"][i, :n_tgt])
        assert bank["dec_out"][i, n_tgt] == EOS
        # units mirror the target tokens
        np.testing.assert_array_equal(
            bank["units"][i, :n_tgt],
            bank["tgt"][i, :n_tgt] - TOKEN_OFFSET + 1)


def test_batched_fbank_matches_online_extractor():
    """Training features must equal what the streaming agents compute
    (modulo the masked-CMVN over valid frames)."""
    from hifigan_tpu.streaming.features import FbankConfig, OnlineFbank

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16_000).astype(np.float32) * 0.1
    ext = OnlineFbank(FbankConfig())
    ext.push(audio)
    ref = ext.frames()  # [T, 80] with utterance CMVN
    T = ref.shape[0]
    n_samples = (T - 1) * 160 + 400
    ours = np.asarray(batched_fbank(
        jnp.asarray(audio[None, :n_samples]), T, 160, 400,
        valid_frames=jnp.array([T])))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_s2st_train_step_decreases_loss():
    cfg = S2STTaskConfig(n_utterances=4, n_speakers=2, batch_size=2,
                         max_seconds=5.0, warmup_steps=1)
    model_cfg = small_config()
    # make it tiny for CPU
    from dataclasses import replace

    model_cfg = replace(model_cfg, hidden_dim=32, encoder_layers=1,
                        decoder_layers=1, num_heads=4, chunk_size=8)
    bank_np = build_s2st_bank(cfg)
    bank = {k: jnp.asarray(v) for k, v in bank_np.items()}
    state, model, tx = create_s2st_state(
        jax.random.PRNGKey(0), model_cfg, cfg)
    step = make_s2st_train_step(model, tx, cfg, bank)
    state, m1 = step(state, jax.random.PRNGKey(1))
    for k, v in m1.items():
        assert np.isfinite(float(v)), k
    # step 1 runs at warmup lr=0; take two more so an update lands
    state, _ = step(state, jax.random.PRNGKey(1))
    state, m3 = step(state, jax.random.PRNGKey(1))
    assert int(state.step) == 3
    # same batch key each time: the optimizer must have reduced the loss
    assert float(m3["loss"]) < float(m1["loss"])


def test_token_f1():
    assert token_f1([1, 2, 3], [1, 2, 3]) == 1.0
    assert token_f1([1, 2], [3, 4]) == 0.0
    assert 0.0 < token_f1([1, 2, 9], [1, 2, 3]) < 1.0
