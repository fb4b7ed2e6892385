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


def test_decoder_fed_units_follow_text():
    """VERDICT r2 item 7: the S2ST agent's unit stream must be a
    function of the committed text prefix when units_from='decoder'."""
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.models.streamspeech import (
        StreamSpeechConfig,
        StreamSpeechS2ST,
    )
    from hifigan_tpu.streaming.runtime import S2STInference, S2STInferenceConfig

    cfg = StreamSpeechConfig(
        input_dim=80, hidden_dim=32, encoder_layers=1, decoder_layers=1,
        num_heads=4, vocab_size=30, unit_vocab_size=50, chunk_size=8,
        vocoder_hidden=32, vocoder_upsample=(4, 2),
        ecapa_channels=32, emo_hidden=32, emo_layers=1,
    )
    model = StreamSpeechS2ST(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)),
                        jnp.zeros((1, 8), jnp.int32))
    inf = S2STInference(model, params, cfg=S2STInferenceConfig(
        source_buckets=(32,), max_target_len=16, max_new_tokens=4))
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32))
    u1, t1 = inf.units_from_text(enc, [5, 9, 3], 0)
    u1b, _ = inf.units_from_text(enc, [5, 9, 3], 0)
    assert u1 == u1b  # deterministic
    u2, _ = inf.units_from_text(enc, [5, 9, 3, 11, 7], 0)
    # longer text prefix ⇒ unit stream extends (prefix-consistent)
    assert len(u2) >= len(u1)
    # prefix continuation: consuming emitted units yields only the tail
    if u1:
        tail, total = inf.units_from_text(enc, [5, 9, 3], len(u1))
        assert tail == [] or len(tail) < len(u1) or total >= t1
    # empty text ⇒ no units
    assert inf.units_from_text(enc, [], 0) == ([], 0)


def test_model_decoder_units_single_pass():
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.models.streamspeech import (
        StreamSpeechConfig,
        StreamSpeechS2ST,
    )

    cfg = StreamSpeechConfig(
        input_dim=80, hidden_dim=32, encoder_layers=1, decoder_layers=1,
        num_heads=4, vocab_size=30, unit_vocab_size=50, chunk_size=8,
        vocoder_hidden=32, vocoder_upsample=(4, 2),
        ecapa_channels=32, emo_hidden=32, emo_layers=1,
    )
    model = StreamSpeechS2ST(cfg)
    mel = jnp.zeros((1, 16, 80))
    tgt = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), mel, tgt,
                        decoder_units_out=True)
    out = model.apply(params, mel, tgt, run_vocoder=False,
                      decoder_units_out=True)
    assert out["decoder_unit_logits"].shape == (1, 64, 50)  # 8× upsample
    # matches the standalone method
    du = model.apply(params, out["encoder_outputs"], tgt,
                     method=lambda m, e, t: m.decoder_units(e, t))
    np.testing.assert_allclose(np.asarray(du),
                               np.asarray(out["decoder_unit_logits"]),
                               atol=1e-5)


def test_learned_transition_head_and_hmt_mode():
    """VERDICT r2 item 8: transition head exists, trains (BCE in the
    multitask step), and drives the HMT READ/WRITE gate."""
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.models.streamspeech import (
        StreamSpeechConfig,
        StreamSpeechS2ST,
    )
    from hifigan_tpu.streaming.runtime import S2STInference, S2STInferenceConfig

    cfg = StreamSpeechConfig(
        input_dim=80, hidden_dim=32, encoder_layers=1, decoder_layers=1,
        num_heads=4, vocab_size=30, unit_vocab_size=50, chunk_size=8,
        vocoder_hidden=32, vocoder_upsample=(4, 2),
        ecapa_channels=32, emo_hidden=32, emo_layers=1,
    )
    model = StreamSpeechS2ST(cfg)
    mel = jnp.zeros((1, 16, 80))
    tgt = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), mel, tgt, run_vocoder=False,
                        decoder_units_out=True)
    assert "transition_head" in params["params"]
    out = model.apply(params, mel, tgt, run_vocoder=False,
                      decoder_units_out=True)
    assert out["write_logits"].shape == (1, 8)
    # decoder_scores method matches
    lg, wl = model.apply(params, out["encoder_outputs"], tgt,
                         method=lambda m, e, t: m.decoder_scores(e, t))
    np.testing.assert_allclose(np.asarray(wl), np.asarray(out["write_logits"]),
                               atol=1e-5)
    # HMT decode with the learned gate runs end-to-end
    inf = S2STInference(model, params, cfg=S2STInferenceConfig(
        source_buckets=(32,), max_target_len=16, max_new_tokens=3))
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32))
    st = inf.continue_text_hmt(enc, [], src_len=8, source_finished=True,
                               transition="learned")
    assert st.best() is not None


def test_s2st_step_reports_transition_metrics():
    from dataclasses import replace

    cfg = S2STTaskConfig(n_utterances=4, n_speakers=2, batch_size=2,
                         max_seconds=5.0, warmup_steps=1)
    model_cfg = replace(small_config(), hidden_dim=32, encoder_layers=1,
                        decoder_layers=1, num_heads=4, chunk_size=8)
    bank = {k: jnp.asarray(v) for k, v in build_s2st_bank(cfg).items()}
    state, model, tx = create_s2st_state(jax.random.PRNGKey(0), model_cfg, cfg)
    step = make_s2st_train_step(model, tx, cfg, bank)
    _state, m = step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["transition_bce"]))
    assert np.isfinite(float(m["unit_dec_ctc"]))
    assert 0.0 <= float(m["transition_acc"]) <= 1.0
