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


def test_device_data_sampler_and_train_step():
    """On-device data path (train/device_data.py): bank building, traced
    crop sampling, and the sample_fn-driven fused train step."""
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.train import TrainConfig, create_train_state, make_train_step
    from hifigan_tpu.train.corpus import FormantSpeechDataset
    from hifigan_tpu.train.device_data import build_audio_bank, make_device_sampler
    from tests.test_train_step import TINY

    ds = FormantSpeechDataset(segment_samples=128, size=4, n_speakers=2)
    bank_np, lens_np = build_audio_bank(ds)
    assert bank_np.shape[0] == 4 and bank_np.shape[1] % 128 == 0
    assert (lens_np <= bank_np.shape[1]).all()

    bank = jnp.asarray(bank_np)
    lens = jnp.asarray(lens_np)
    sample = make_device_sampler(bank, lens, 128, batch_size=2)
    crops = jax.jit(sample)(jax.random.PRNGKey(0))
    assert crops.shape == (2, 128)
    # every crop is a contiguous slice of some bank row
    crops_np = np.asarray(crops)
    for row in crops_np:
        found = any(
            np.array_equal(row, bank_np[i, o:o + 128])
            for i in range(4)
            for o in range(0, int(lens_np[i]) - 127, 1)
            if np.array_equal(row[:4], bank_np[i, o:o + 4])
        )
        assert found

    state, vocoder, discs = create_train_state(
        jax.random.PRNGKey(0), TINY, mel_frames=16, batch_size=2)
    step = make_train_step(vocoder, discs, TINY, donate=False,
                           multi_steps=2, sample_fn=sample)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    new_state, metrics = step(state, keys)
    assert int(new_state.step) == 2
    assert np.isfinite(float(metrics["generator_loss"]))
