"""TPU-first numeric ops: convolution primitives, ODConv attention math,
GRC-LoRA contractions, FiLM, and STFT/mel transforms.

Everything here is pure-functional JAX operating on channels-last
``[B, T, C]`` activations (TPU lane dim = channels) with static shapes.
"""

from hifigan_tpu.ops.conv import (
    conv1d,
    conv2d,
    conv_transpose1d,
    dynamic_conv1d,
    dynamic_conv_transpose1d,
    avg_pool1d,
    extract_patches_1d,
)
from hifigan_tpu.ops.film import film
from hifigan_tpu.ops.stft import (
    stft_magnitude,
    mel_filterbank,
    mel_spectrogram,
    log_mel_spectrogram,
    MelConfig,
)

__all__ = [
    "conv1d",
    "conv2d",
    "conv_transpose1d",
    "dynamic_conv1d",
    "dynamic_conv_transpose1d",
    "avg_pool1d",
    "extract_patches_1d",
    "film",
    "stft_magnitude",
    "mel_filterbank",
    "mel_spectrogram",
    "log_mel_spectrogram",
    "MelConfig",
]
