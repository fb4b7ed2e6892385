"""Evaluation metric tests (cosine/AL/BLEU/report)."""

import json
import numpy as np
import jax.numpy as jnp
import pytest

from hifigan_tpu.eval.metrics import (
    average_lagging,
    corpus_bleu,
    cosine_similarity,
    mcd,
    verify_speaker,
    _bleu_fallback,
)
from hifigan_tpu.eval.evaluator import BENCHMARKS, create_evaluation_report


def test_cosine_similarity():
    a = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    b = jnp.asarray([[1.0, 0.0], [-1.0, -1.0]])
    sim = np.asarray(cosine_similarity(a, b))
    np.testing.assert_allclose(sim, [1.0, -1.0], atol=1e-6)


def test_verify_speaker_threshold():
    e = jnp.asarray([[1.0, 0.0]])
    same, sim = verify_speaker(e, e)
    assert bool(same[0]) and float(sim[0]) > 0.99
    diff, _ = verify_speaker(e, jnp.asarray([[0.0, 1.0]]))
    assert not bool(diff[0])


def test_average_lagging():
    assert average_lagging([1.0, 2.0], [1.5, 3.0]) == pytest.approx(0.75)
    assert average_lagging([], []) == 0.0


def test_corpus_bleu_perfect_and_fallback():
    hyps = ["the cat sat on the mat", "hello world foo bar"]
    refs = ["the cat sat on the mat", "hello world foo bar"]
    assert corpus_bleu(hyps, refs) == pytest.approx(100.0, abs=0.1)
    assert _bleu_fallback(hyps, refs) == pytest.approx(100.0, abs=0.1)
    # fallback tracks sacrebleu on an imperfect pair
    hyps2 = ["the cat sat on a mat today ok", "hello world foo baz zap quux more"]
    sb = corpus_bleu(hyps2, refs)
    fb = _bleu_fallback(hyps2, refs)
    assert 0 < fb < 100 and 0 < sb < 100
    assert abs(sb - fb) < 15.0


def test_mcd_zero_for_identical(rng):
    m = rng.standard_normal((10, 80))
    assert mcd(m, m) == pytest.approx(0.0, abs=1e-9)
    assert mcd(m, m + 1e-1 * rng.standard_normal((10, 80))) > 0


def test_report_pass_fail(tmp_path):
    results = [
        {"speaker_similarity": 0.8, "emotion_similarity": 0.75, "asr_bleu": 25.0},
        {"speaker_similarity": 0.78, "emotion_similarity": 0.72, "asr_bleu": 22.0},
    ]
    path = str(tmp_path / "report.json")
    rep = create_evaluation_report(results, path)
    assert rep["benchmarks"]["speaker_similarity"]["status"] == "PASS"
    assert rep["benchmarks"]["asr_bleu"]["status"] == "PASS"
    assert rep["benchmarks"]["speaker_similarity"]["benchmark"] == 0.73
    with open(path) as f:
        assert json.load(f)["num_samples"] == 2
    bad = [{"speaker_similarity": 0.5, "emotion_similarity": 0.4, "asr_bleu": 5.0}]
    rep2 = create_evaluation_report(bad)
    assert rep2["benchmarks"]["speaker_similarity"]["status"] == "FAIL"


def test_asr_bleu_cli_roundtrip(tmp_path, rng):
    """Full asr_bleu pipeline with an injected transcriber (no network)."""
    from hifigan_tpu.eval.asr_bleu import run_asr_bleu, write_wav
    from hifigan_tpu.eval.asr import NullTranscriber

    refs = ["hello world how are you", "goodbye now see you later"]
    d = tmp_path / "audio"
    d.mkdir()
    for i in range(2):
        write_wav(str(d / f"{i}_pred.wav"), rng.standard_normal(1600) * 0.1)
    (tmp_path / "refs.txt").write_text("\n".join(refs))
    out = run_asr_bleu(
        "en", str(d), str(tmp_path / "refs.txt"),
        transcriber=NullTranscriber({0: refs[0], 1: refs[1]}),
        transcripts_path=str(tmp_path / "hyps.txt"),
    )
    assert out["bleu"] == pytest.approx(100.0, abs=0.1)
    assert (tmp_path / "hyps.txt").read_text().splitlines() == refs


def test_silence_removal():
    from hifigan_tpu.eval.asr_bleu import remove_silence
    sr = 16000
    loud = np.sin(np.linspace(0, 100, sr)).astype(np.float32)
    silent = np.zeros(sr, np.float32)
    audio = np.concatenate([silent, loud, silent])
    trimmed = remove_silence(audio, sr)
    assert len(trimmed) < len(audio)
    assert len(trimmed) >= len(loud) * 0.9


def test_hinge_losses(rng):
    import jax.numpy as jnp
    from hifigan_tpu.train.losses import (
        discriminator_loss,
        generator_adversarial_loss,
    )

    fake = [jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))]
    real = [jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))]
    g = generator_adversarial_loss(fake, "hinge")
    assert np.isfinite(float(g))
    d = discriminator_loss(real, fake, "hinge")
    assert float(d) >= 0.0
    # perfect discriminator (real>=1, fake<=-1) has zero hinge loss
    d0 = discriminator_loss([jnp.ones((2, 5)) * 2], [jnp.ones((2, 5)) * -2], "hinge")
    assert float(d0) == 0.0


def test_stage_timer():
    import time as _t
    from hifigan_tpu.utils import StageTimer

    t = StageTimer()
    with t.stage("a"):
        _t.sleep(0.01)
    with t.stage("a"):
        _t.sleep(0.01)
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["mean_ms"] >= 5


def test_report_skips_uncomputed_metrics():
    """A metric never computed (e.g. no ASR backend on a zero-egress
    rig) is SKIPPED, not failed."""
    from hifigan_tpu.eval.evaluator import create_evaluation_report

    rep = create_evaluation_report(
        [{"speaker_similarity": 0.9, "emotion_similarity": 0.9}])
    assert rep["benchmarks"]["asr_bleu"]["status"] == "SKIPPED"
    assert rep["benchmarks"]["speaker_similarity"]["status"] == "PASS"


def test_phone_cer():
    from hifigan_tpu.eval.asr import phone_cer

    assert phone_cer("aa bb cc", "aa bb cc") == 0.0
    assert phone_cer("aa xx cc", "aa bb cc") == 1 / 3
    assert phone_cer("", "aa bb") == 1.0
    assert phone_cer("aa", "") == 1.0
    assert phone_cer("", "") == 0.0
    # insertion + deletion both count
    assert abs(phone_cer("aa bb cc dd", "aa bb cc") - 1 / 3) < 1e-9


def test_judge_competence_gate():
    """An ASR judge that transcribes ground truth as gibberish must be
    rejected (VERDICT r4 weak #2)."""
    import numpy as np

    from hifigan_tpu.eval.asr import judge_competence, load_competent_ctc

    clips = [np.zeros(1600, np.float32)] * 2
    refs = ["aa bb cc", "dd ee"]
    good = judge_competence(lambda a: refs[0], [clips[0]], [refs[0]])
    assert good["competent"] and good["ground_truth_cer"] == 0.0
    bad = judge_competence(lambda a: "g k g f sh f", clips, refs)
    assert not bad["competent"]
    # nonexistent candidate dirs -> no judge, loud report
    t, rep = load_competent_ctc(["/nonexistent/a", None], clips, refs)
    assert t is None and rep["selected"] is None


def test_evaluator_sims_masked_to_valid_frames():
    """Embedding similarities must be scored over valid frames only:
    the zero-padded bucket tail inflates cosines for short clips (both
    embeddings dominated by shared silence) and a noisy generated tail
    collapses pooled embeddings for long clips (round-4 sample 1:
    emo-SIM 0.418 full-bucket vs 0.858 valid-frame)."""
    from hifigan_tpu.eval.evaluator import StreamEvaluator

    M, F, valid = 4, 10, 6
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(1, M, F)).astype(np.float32))

    def synthesize(m):
        # perfect copy on valid frames, garbage on the padded tail
        out = np.array(m)
        out[..., valid:] = 7.0
        return jnp.asarray(out.reshape(1, 1, M * F))

    ev = StreamEvaluator(
        synthesize_fn=synthesize,
        speaker_embed_fn=lambda m: jnp.mean(m, axis=-1),
        emotion_embed_fn=lambda m: jnp.mean(m * m, axis=-1),
        mel_fn=lambda w: jnp.reshape(w, (1, M, F)),
    )
    r = ev.evaluate_single_sample(mel, valid_frames=valid)
    assert r["speaker_similarity"] == pytest.approx(1.0, abs=1e-5)
    assert r["emotion_similarity"] == pytest.approx(1.0, abs=1e-5)
    assert r["mel_l1"] == pytest.approx(0.0, abs=1e-6)
    # without the mask the tail corruption leaks into the cosines
    r_full = ev.evaluate_single_sample(mel)
    assert r_full["speaker_similarity"] < 0.999
