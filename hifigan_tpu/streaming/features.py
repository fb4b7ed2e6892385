"""Incremental online log-mel-fbank extraction.

Capability parity with the reference's ``OnlineFeatureExtractor``
(``/root/reference/agent/speech_to_speech.streamspeech.agent.py:41-98``,
constants ``:32-38``): 80-dim fbank, 25 ms window / 10 ms shift,
resampling to 16 kHz, global or per-utterance CMVN.

TPU-first: the extractor keeps the raw-sample tail on the host (cheap
ring buffer) and runs framing + mel projection as one jitted
fixed-shape program per *bucketed* frame count, so a growing stream
reuses a handful of compiled programs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hifigan_tpu.ops.stft import _hann, mel_filterbank

Array = jax.Array


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16_000
    shift_ms: int = 10
    window_ms: int = 25
    n_mels: int = 80
    cmvn: str = "utterance"  # "utterance" | "global" | "none"
    global_mean: Optional[tuple] = None
    global_std: Optional[tuple] = None

    @property
    def hop(self) -> int:
        return self.sample_rate * self.shift_ms // 1000

    @property
    def win(self) -> int:
        return self.sample_rate * self.window_ms // 1000


def resample_linear(audio: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Host-side linear resampling (the reference resamples 48 kHz mic
    audio to 16 kHz before fbank)."""
    if src_rate == dst_rate:
        return audio
    n_out = int(round(len(audio) * dst_rate / src_rate))
    x_old = np.linspace(0.0, 1.0, num=len(audio), endpoint=False)
    x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
    return np.interp(x_new, x_old, audio).astype(np.float32)


@partial(jax.jit, static_argnames=("n_frames", "hop", "win", "n_mels", "sample_rate"))
def _fbank_program(
    samples: Array, n_frames: int, hop: int, win: int, n_mels: int, sample_rate: int
) -> Array:
    """``[n_frames*hop + win - hop] → [n_frames, n_mels]`` log-fbank."""
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = samples[idx] * jnp.asarray(_hann(win))
    n_fft = int(2 ** np.ceil(np.log2(win)))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, 20.0, sample_rate / 2))
    mel = power @ fb
    return jnp.log(jnp.maximum(mel, 1e-10))


class OnlineFbank:
    """Stateful incremental extractor: ``push(samples) → new frames``.

    Frames are emitted once their full 25 ms window is available; the
    unconsumed tail is kept for the next push. ``frames()`` returns all
    frames so far with CMVN applied (utterance CMVN is recomputed over
    the whole prefix each call, matching the reference's re-extraction
    semantics)."""

    BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)

    def __init__(self, cfg: FbankConfig = FbankConfig(), src_rate: Optional[int] = None):
        self.cfg = cfg
        self.src_rate = src_rate or cfg.sample_rate
        self._tail = np.zeros((0,), np.float32)
        self._frames: list[np.ndarray] = []

    def push(self, samples: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        samples = resample_linear(
            np.asarray(samples, np.float32).reshape(-1), self.src_rate, cfg.sample_rate
        )
        buf = np.concatenate([self._tail, samples])
        n_frames = max(0, (len(buf) - cfg.win) // cfg.hop + 1) if len(buf) >= cfg.win else 0
        if n_frames == 0:
            self._tail = buf
            return np.zeros((0, cfg.n_mels), np.float32)
        # bucket the frame count so a stream reuses few compiled programs
        bucket = next((b for b in self.BUCKETS if b >= n_frames), n_frames)
        need = (bucket - 1) * cfg.hop + cfg.win
        padded = np.pad(buf, (0, max(0, need - len(buf))))
        mel = np.asarray(_fbank_program(
            jnp.asarray(padded[:need]), bucket, cfg.hop, cfg.win,
            cfg.n_mels, cfg.sample_rate,
        ))[:n_frames]
        self._frames.append(mel)
        self._tail = buf[n_frames * cfg.hop :]
        return mel

    def frames(self) -> np.ndarray:
        cfg = self.cfg
        if not self._frames:
            return np.zeros((0, cfg.n_mels), np.float32)
        mel = np.concatenate(self._frames, axis=0)
        if cfg.cmvn == "utterance":
            mean = mel.mean(axis=0, keepdims=True)
            std = mel.std(axis=0, keepdims=True) + 1e-5
            mel = (mel - mean) / std
        elif cfg.cmvn == "global" and cfg.global_mean is not None:
            mean = np.asarray(cfg.global_mean, np.float32)
            std = np.asarray(cfg.global_std, np.float32) + 1e-5
            mel = (mel - mean) / std
        return mel

    @property
    def num_frames(self) -> int:
        return sum(f.shape[0] for f in self._frames)

    def reset(self):
        self._tail = np.zeros((0,), np.float32)
        self._frames.clear()
