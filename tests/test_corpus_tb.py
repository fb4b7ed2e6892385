"""Formant corpus determinism/structure + TensorBoard scalar export."""

import json
import os

import numpy as np

from hifigan_tpu.train.corpus import (
    FormantSpeechCorpus,
    FormantSpeechDataset,
    write_eval_clips,
)


def test_corpus_deterministic_and_speaker_dependent():
    c = FormantSpeechCorpus()
    a = c.utterance(3, 7)
    b = c.utterance(3, 7)
    np.testing.assert_array_equal(a, b)
    other = c.utterance(4, 7)
    assert a.shape != other.shape or not np.allclose(a[:2000], other[:2000])
    assert 0.5 <= len(a) / 16000 <= 6.0
    assert np.abs(a).max() <= 0.71


def test_corpus_has_harmonic_structure():
    """Voiced segments must show an f0 peak in the speech range."""
    c = FormantSpeechCorpus()
    u = c.utterance(0, 0)
    # strongest 4096-sample window
    frames = u[: len(u) // 4096 * 4096].reshape(-1, 4096)
    seg = frames[np.argmax((frames ** 2).sum(1))] * np.hanning(4096)
    mag = np.abs(np.fft.rfft(seg))
    peak_hz = (np.argmax(mag[10:300]) + 10) * 16000 / 4096
    assert 60 <= peak_hz <= 500, peak_hz


def test_dataset_crops_and_eval_clips(tmp_path):
    ds = FormantSpeechDataset(segment_samples=4096, size=8)
    x = ds[0]
    assert x.shape == (4096,) and x.dtype == np.float32
    np.testing.assert_array_equal(ds[3], ds[3])
    paths = write_eval_clips(str(tmp_path / "clips"), n_clips=3)
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
    from hifigan_tpu.eval.asr_bleu import read_wav

    audio, sr = read_wav(paths[0])
    assert sr == 16000 and len(audio) > 8000


def test_tb_export(tmp_path):
    from hifigan_tpu.utils.tb import HAVE_TENSORBOARD, export_metrics_jsonl

    metrics = tmp_path / "metrics.jsonl"
    with open(metrics, "w") as f:
        for s in range(3):
            f.write(json.dumps({"step": s, "generator_loss": 1.0 / (s + 1),
                                "mel_loss": 2.0, "wall_s": 1.2}) + "\n")
    logdir = tmp_path / "tb"
    n = export_metrics_jsonl(str(metrics), str(logdir))
    assert n == 3
    if HAVE_TENSORBOARD:
        files = os.listdir(logdir)
        assert any("tfevents" in f for f in files)
        # events round-trip through the official reader
        from tensorboard.backend.event_processing.event_file_loader import (
            EventFileLoader,
        )

        path = os.path.join(logdir, [f for f in files if "tfevents" in f][0])
        tags = set()
        for ev in EventFileLoader(path).Load():
            for v in getattr(ev.summary, "value", []):
                tags.add(v.tag)
        assert {"generator_loss", "mel_loss"} <= tags


def test_prune_metrics_on_resume(tmp_path):
    """Resuming from an earlier checkpoint must drop stale/future rows so
    metrics.jsonl stays strictly step-increasing (ADVICE r4 #4)."""
    from hifigan_tpu.utils.tb import prune_metrics

    metrics = tmp_path / "metrics.jsonl"
    rows = [
        {"step": 4000, "mel": 0.20},
        {"step": 4400, "mel": 0.19},
        {"step": 4800, "mel": 0.18},
        {"step": 5200, "mel": 0.17},
        {"step": 5600, "mel": 0.16},
        # duplicate out-of-order rows from an earlier buggy resume
        {"step": 4400, "mel": 0.21},
        {"step": 4800, "mel": 0.20},
    ]
    with open(metrics, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    dropped = prune_metrics(str(metrics), resume_step=4800)
    assert dropped == 4  # 5200, 5600 (future) + the two duplicates
    kept = [json.loads(l) for l in open(metrics)]
    assert [r["step"] for r in kept] == [4000, 4400, 4800]
    # values are the first (original) occurrence of each step
    assert kept[1]["mel"] == 0.19

    # idempotent, and a no-op leaves the file byte-identical
    before = open(metrics).read()
    assert prune_metrics(str(metrics), resume_step=4800) == 0
    assert open(metrics).read() == before

    # missing file is a harmless no-op
    assert prune_metrics(str(tmp_path / "absent.jsonl"), 100) == 0
