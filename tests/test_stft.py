"""STFT / mel ops validated against independent numpy reference math."""

import numpy as np
import jax.numpy as jnp

from hifigan_tpu.ops import stft as stft_ops


def _np_stft_mag(x, n_fft, hop, center=True):
    if center:
        x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    n = np.arange(n_fft)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * n / n_fft)
    frames = []
    for s in range(0, len(x) - n_fft + 1, hop):
        frames.append(x[s : s + n_fft] * win)
    return np.abs(np.fft.rfft(np.stack(frames), axis=-1))


def test_stft_magnitude_matches_numpy(rng):
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    mag = np.asarray(stft_ops.stft_magnitude(jnp.asarray(x), 512, 128))
    ref = np.stack([_np_stft_mag(xi, 512, 128) for xi in x])
    assert mag.shape == ref.shape
    np.testing.assert_allclose(mag, ref, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_properties():
    fb = stft_ops.mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # every mel band has some support; bands tile the spectrum
    assert (fb.sum(axis=0) > 0).all()
    # triangles overlap: most freq bins (inside [fmin,fmax]) touch ≤2 bands
    nonzero_per_bin = (fb > 0).sum(axis=1)
    assert nonzero_per_bin.max() <= 2


def test_mel_spectrogram_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    cfg = stft_ops.MelConfig(n_fft=1024, hop_length=256, win_length=1024, n_mels=80)
    mel = stft_ops.mel_spectrogram(x, cfg)
    assert mel.shape == (2, 4096 // 256 + 1, 80)
    logmel = stft_ops.log_mel_spectrogram(x, cfg)
    assert np.isfinite(np.asarray(logmel)).all()


def test_multi_resolution_stft_loss_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    loss = stft_ops.multi_resolution_stft_loss(x, x, resolutions=((512, 128, 512),))
    assert float(loss) < 1e-5
    y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    assert float(stft_ops.multi_resolution_stft_loss(x, y, resolutions=((512, 128, 512),))) > 0.1
