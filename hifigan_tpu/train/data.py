"""Training data pipeline: audio datasets, augmentation, batching.

Capability parity with the reference's data configuration
(``/root/reference/configs/train_config.yaml``: CVSS-T + CommonVoice
dataset paths, augmentation with pitch ±2 semitones / stretch 0.9–1.1 /
noise 0.01, batch 16, 4 workers; and
``configs/incremental_train_config.yaml``: incremental 25% chunking with
checkpoint/resume).  The reference ships configs but no dataset code;
this module supplies the working pipeline:

* :class:`WavDirectoryDataset` — recursive ``*.wav`` loader (stdlib IO,
  no librosa), fixed-length random crops;
* :class:`SyntheticSpeechDataset` — deterministic harmonic "speech" for
  tests/benchmarks without corpus downloads;
* :func:`augment` — pitch shift (resample), time stretch, additive noise
  per the reference's augmentation block;
* :class:`BatchLoader` — shuffled epochs of device-ready batches
  (host keeps raw audio only; mel is computed on-device in the train
  step), with optional incremental chunking (``num_chunks``) mirroring
  the reference's memory-constrained schedule.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from hifigan_tpu.eval.asr_bleu import read_wav
from hifigan_tpu.streaming.features import resample_linear


@dataclass
class AugmentConfig:
    """Defaults per reference train_config.yaml augmentation block."""

    pitch_semitones: float = 2.0
    stretch_min: float = 0.9
    stretch_max: float = 1.1
    noise_std: float = 0.01
    probability: float = 0.5


def augment(audio: np.ndarray, cfg: AugmentConfig, rng: random.Random) -> np.ndarray:
    if rng.random() < cfg.probability:
        semis = rng.uniform(-cfg.pitch_semitones, cfg.pitch_semitones)
        rate = 2.0 ** (semis / 12.0)
        audio = resample_linear(audio, int(16000 * rate), 16000)
    if rng.random() < cfg.probability:
        stretch = rng.uniform(cfg.stretch_min, cfg.stretch_max)
        audio = resample_linear(audio, 16000, int(16000 * stretch))
    if cfg.noise_std > 0 and rng.random() < cfg.probability:
        audio = audio + np.random.default_rng(rng.randrange(1 << 31)).normal(
            0, cfg.noise_std, len(audio)
        ).astype(np.float32)
    return audio.astype(np.float32)


class WavDirectoryDataset:
    """Recursive wav-file dataset with fixed-length random crops."""

    def __init__(self, root: str, *, segment_samples: int = 8192,
                 sample_rate: int = 16_000, augment_cfg: Optional[AugmentConfig] = None,
                 seed: int = 0):
        self.files: List[str] = []
        for dirpath, _, names in os.walk(root):
            for n in sorted(names):
                if n.lower().endswith(".wav"):
                    self.files.append(os.path.join(dirpath, n))
        if not self.files:
            raise FileNotFoundError(f"no .wav files under {root}")
        self.segment_samples = segment_samples
        self.sample_rate = sample_rate
        self.augment_cfg = augment_cfg
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        audio, sr = read_wav(self.files[idx % len(self.files)])
        if sr != self.sample_rate:
            audio = resample_linear(audio, sr, self.sample_rate)
        if self.augment_cfg:
            audio = augment(audio, self.augment_cfg, self._rng)
        seg = self.segment_samples
        if len(audio) < seg:
            audio = np.pad(audio, (0, seg - len(audio)))
        start = self._rng.randrange(0, len(audio) - seg + 1)
        return audio[start : start + seg].astype(np.float32)


class SyntheticSpeechDataset:
    """Harmonic + noise pseudo-speech; deterministic per index."""

    def __init__(self, *, segment_samples: int = 8192, sample_rate: int = 16_000,
                 size: int = 1024):
        self.segment_samples = segment_samples
        self.sample_rate = sample_rate
        self.size = size

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng(idx)
        t = np.arange(self.segment_samples) / self.sample_rate
        f0 = rng.uniform(80, 250)
        sig = np.zeros_like(t, dtype=np.float64)
        for h in range(1, 6):
            sig += rng.uniform(0.1, 1.0) / h * np.sin(
                2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi)
            )
        env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(1, 4) * t))
        sig = sig * env + rng.normal(0, 0.01, len(t))
        return (0.5 * sig / (np.abs(sig).max() + 1e-9)).astype(np.float32)


class BatchLoader:
    """Shuffled epochs of ``{"audio": [B, T]}`` batches.

    ``num_chunks > 1`` splits the dataset into sequential chunks
    (reference incremental training: 25% chunks with per-chunk
    checkpointing)."""

    def __init__(self, dataset, batch_size: int = 16, *, seed: int = 0,
                 num_chunks: int = 1, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_chunks = num_chunks
        self.drop_last = drop_last

    def epoch(self, epoch_idx: int = 0, chunk: int = 0) -> Iterator[dict]:
        idx = list(range(len(self.dataset)))
        if self.num_chunks > 1:
            per = max(1, len(idx) // self.num_chunks)
            idx = idx[chunk * per : (chunk + 1) * per]
        rng = random.Random(self.seed + epoch_idx)
        rng.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            batch_idx = idx[i : i + self.batch_size]
            if self.drop_last and len(batch_idx) < self.batch_size:
                break
            audio = np.stack([self.dataset[j] for j in batch_idx])
            yield {"audio": audio}
