"""Data pipeline tests: wav dataset, augmentation, batching, chunking."""

import random

import numpy as np

from hifigan_tpu.eval.asr_bleu import write_wav
from hifigan_tpu.train.data import (
    AugmentConfig,
    BatchLoader,
    SyntheticSpeechDataset,
    WavDirectoryDataset,
    augment,
)


def test_synthetic_dataset_deterministic():
    ds = SyntheticSpeechDataset(segment_samples=512, size=4)
    a = ds[1]
    b = ds[1]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (512,)
    assert np.abs(a).max() <= 0.5 + 1e-6
    assert np.abs(ds[1] - ds[2]).max() > 1e-3


def test_wav_directory_dataset(tmp_path, rng):
    sub = tmp_path / "nested"
    sub.mkdir()
    for i in range(3):
        write_wav(str(sub / f"clip_{i}.wav"), rng.standard_normal(4000) * 0.2)
    ds = WavDirectoryDataset(str(tmp_path), segment_samples=1024)
    assert len(ds) == 3
    seg = ds[0]
    assert seg.shape == (1024,) and seg.dtype == np.float32


def test_augment_changes_signal(rng):
    audio = rng.standard_normal(4000).astype(np.float32) * 0.2
    cfg = AugmentConfig(probability=1.0)
    out = augment(audio, cfg, random.Random(0))
    assert out.dtype == np.float32
    assert out.shape != audio.shape or np.abs(out - audio).max() > 1e-4


def test_batch_loader_epochs_and_chunks():
    ds = SyntheticSpeechDataset(segment_samples=256, size=16)
    loader = BatchLoader(ds, batch_size=4, num_chunks=2)
    b0 = list(loader.epoch(0, chunk=0))
    b1 = list(loader.epoch(0, chunk=1))
    assert len(b0) == 2 and len(b1) == 2  # 8 samples per chunk / batch 4
    assert b0[0]["audio"].shape == (4, 256)
    # different epochs shuffle differently
    e0 = np.concatenate([b["audio"] for b in loader.epoch(0, 0)])
    e1 = np.concatenate([b["audio"] for b in loader.epoch(1, 0)])
    assert not np.array_equal(e0, e1)
