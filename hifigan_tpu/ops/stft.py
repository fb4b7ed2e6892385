"""STFT / mel-spectrogram ops (XLA FFT based).

The reference never computes a real mel loss — its GAN trainer substitutes
the *input* mel for the generated-audio mel
(``/root/reference/hifigan_modified/complete_vocoder.py:210-212``) and the
alternative trainer uses a slice of the waveform as a "dummy mel"
(``/root/reference/hifigan_modified/conditioned_hifigan.py:269-274``).
Per SURVEY.md §7 this build implements the stated design: a true
STFT → |·| → Slaney-mel pipeline (librosa-compatible filterbank, matching
the reference's feature extraction in
``/root/reference/speaker_embedding/ecapa_tdnn.py:143-195``), plus
multi-resolution STFT auxiliary losses.

All shapes static; FFT runs as an XLA op on TPU; the mel projection is a
single ``[n_freq, n_mels]`` matmul (MXU).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class MelConfig:
    """Audio analysis configuration (defaults per
    ``/root/reference/configs/eval_config.yaml`` audio block:
    sr 16 kHz, n_fft 1024, hop 256, win 1024, 80 mels)."""

    sample_rate: int = 16_000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = 8000.0
    center: bool = True
    log_eps: float = 1e-5


def _hann(win_length: int) -> np.ndarray:
    # periodic Hann (matches torch.hann_window / librosa default)
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def frame_signal(x: Array, n_fft: int, hop: int, *, center: bool = True) -> Array:
    """Slice ``[B, T]`` audio into ``[B, n_frames, n_fft]`` frames.

    When ``hop`` divides ``n_fft`` (every config in this repo), framing is
    ``n_fft // hop`` static slices of a ``[B, rows, hop]`` reshape — pure
    windowed copies, no gather: ``frame[i, a·hop + b] = x[(i+a)·hop + b]``,
    so frame column-block ``a`` is rows ``a .. a+n_frames`` of the reshape.
    Falls back to a constant-index gather otherwise.
    """
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    B, T = x.shape
    n_frames = 1 + (T - n_fft) // hop
    if n_fft % hop == 0:
        k = n_fft // hop
        rows = n_frames + k - 1
        y = x[:, : rows * hop].reshape(B, rows, hop)
        return jnp.concatenate(
            [y[:, a : a + n_frames] for a in range(k)], axis=-1
        )
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[:, idx]


def stft_magnitude(
    x: Array,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    *,
    center: bool = True,
    power: float = 1.0,
    eps: float = 1e-9,
) -> Array:
    """``[B, T] -> [B, n_frames, n_fft//2 + 1]`` magnitude spectrogram."""
    win_length = win_length or n_fft
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop, center=center)
    window = jnp.asarray(_hann(win_length))
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + eps)
    if power != 1.0:
        mag = mag**power
    return mag


def _hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale (librosa default)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    *,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank ``[n_fft//2+1, n_mels]``
    (librosa ``filters.mel``-compatible, transposed for right-matmul)."""
    fmax = fmax or sample_rate / 2
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    weights = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_freqs, n_mels]


def mel_spectrogram(x: Array, cfg: MelConfig = MelConfig()) -> Array:
    """``[B, T_samples] -> [B, n_frames, n_mels]`` (power=1 mel spectrogram)."""
    mag = stft_magnitude(x, cfg.n_fft, cfg.hop_length, cfg.win_length, center=cfg.center)
    fb = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )
    return jnp.einsum("btf,fm->btm", mag, fb, preferred_element_type=jnp.float32)


def log_mel_spectrogram(x: Array, cfg: MelConfig = MelConfig()) -> Array:
    return jnp.log(jnp.maximum(mel_spectrogram(x, cfg), cfg.log_eps))


def spectral_convergence(mag_fake: Array, mag_real: Array) -> Array:
    num = jnp.linalg.norm(mag_real - mag_fake, axis=(-2, -1))
    den = jnp.linalg.norm(mag_real, axis=(-2, -1)) + 1e-9
    return jnp.mean(num / den)


def log_stft_magnitude_loss(mag_fake: Array, mag_real: Array) -> Array:
    return jnp.mean(jnp.abs(jnp.log(mag_real + 1e-7) - jnp.log(mag_fake + 1e-7)))


def multi_resolution_stft_loss(
    fake: Array,
    real: Array,
    resolutions: tuple[tuple[int, int, int], ...] = (
        (1024, 256, 1024),
        (2048, 512, 2048),
        (512, 128, 512),
    ),
) -> Array:
    """Σ over (n_fft, hop, win): spectral convergence + log-mag L1.

    Args: fake, real ``[B, T_samples]``.
    """
    loss = 0.0
    for n_fft, hop, win in resolutions:
        mf = stft_magnitude(fake, n_fft, hop, win)
        mr = stft_magnitude(real, n_fft, hop, win)
        loss = loss + spectral_convergence(mf, mr) + log_stft_magnitude_loss(mf, mr)
    return loss / len(resolutions)
