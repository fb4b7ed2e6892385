"""Unit-vocoder training substrate: translated-plan rendering,
unit/duration alignment, bank construction, and one GAN step (tiny)."""

import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.models.code_vocoder import CodeVocoderConfig
from hifigan_tpu.train.corpus import PHONE_TO_ID, FormantSpeechCorpus
from hifigan_tpu.train.unit_vocoder import (
    FRAME_SAMPLES,
    UnitVocoderTaskConfig,
    build_unit_vocoder_bank,
    create_unit_vocoder_state,
    make_unit_vocoder_train_step,
    plan_units_durations,
    translate_plan,
)


def test_translate_plan_reverses_words_keeps_durations():
    plan = [("s", 0.05), ("a", 0.1), ("pau", 0.06), ("t", 0.04), ("pau", 0.08)]
    t = translate_plan(plan)
    assert len(t) == len(plan)
    # word 1 = [s a] reversed → durations come out as [0.1, 0.05]
    assert (t[0][1], t[1][1]) == (0.1, 0.05)
    assert t[2] == ("pau", 0.06)
    # phones are permuted (never pau for non-pau input)
    assert t[0][0] != "pau" and t[3][0] != "pau"
    # total duration preserved exactly
    assert abs(sum(d for _, d in t) - sum(d for _, d in plan)) < 1e-9


def test_plan_units_durations_alignment():
    plan = [("s", 0.05), ("a", 0.21), ("pau", 0.06)]
    units, durs = plan_units_durations(plan, max_dur=16)
    assert units[0] == PHONE_TO_ID["s"] and units[2] == 0
    total_s = sum(d for _, d in plan)
    # cumulative rounding: total frames within 1 frame of audio length
    assert abs(int(durs.sum()) - round(total_s * 16000 / FRAME_SAMPLES)) <= 1


def test_render_plan_matches_utterance_duration():
    c = FormantSpeechCorpus(n_speakers=4)
    _w, plan, ar = c.utterance(0, 0, content=99, return_plan=True)
    t_plan = translate_plan(plan)
    wav = c.render_plan(1, t_plan, arousal=ar, seed=3)
    # translated rendition has the same total duration as the plan
    assert abs(len(wav) - int(sum(d for _, d in t_plan) * 16000) - 1) <= 1


def _tiny_task():
    return UnitVocoderTaskConfig(
        n_utterances=4, n_speakers=2, max_units=64, window_units=8,
        batch_size=2,
        code=CodeVocoderConfig(unit_vocab_size=32, embed_dim=16,
                               upsample_factors=(4, 2), hidden_channels=32,
                               max_duration_per_unit=4))


def test_unit_vocoder_bank_and_train_step():
    from dataclasses import replace

    from hifigan_tpu.ops.stft import MelConfig
    from hifigan_tpu.train import TrainConfig
    from hifigan_tpu.train.losses import LossWeights

    task = _tiny_task()
    bank_np = build_unit_vocoder_bank(task)
    assert bank_np["units"].shape == (4, 64)
    assert (bank_np["counts"] >= task.window_units).all()
    # cumdur really is the duration prefix sum
    np.testing.assert_array_equal(
        bank_np["cumdur"][:, 1:], np.cumsum(bank_np["durs"], axis=1))
    bank = {k: jnp.asarray(v) for k, v in bank_np.items()}

    tcfg = TrainConfig(
        warmup_steps=0, decay_steps=100,
        mel=MelConfig(n_fft=64, hop_length=16, win_length=64, n_mels=16),
        loss_weights=LossWeights(feature_matching=2.0, multi_res_stft=0.0))
    state, cv, discs = create_unit_vocoder_state(
        jax.random.PRNGKey(0), tcfg, task)
    step = make_unit_vocoder_train_step(cv, discs, tcfg, task)
    before = np.asarray(
        state.gen_params["params"]["unit_embedding"]["embedding"]).copy()
    state, m = step(state, jax.random.PRNGKey(1), bank)
    for k, v in m.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 1
    after = np.asarray(
        state.gen_params["params"]["unit_embedding"]["embedding"])
    assert not np.allclose(before, after)
