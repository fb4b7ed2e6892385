"""Model families (flax.linen), mirroring the reference capability surface:

- :mod:`generator` — modified HiFi-GAN generator (ODConv + GRC-LoRA + FiLM)
  and a plain HiFi-GAN V1 baseline generator.
- :mod:`discriminators` — multi-period / multi-scale GAN discriminators.
- :mod:`embeddings` — ECAPA-TDNN speaker encoder, Emotion2Vec emotion encoder.
- :mod:`conformer` — chunked-attention Conformer encoder.
- :mod:`streamspeech` — simultaneous S2ST model (encoder + dual CTC +
  text decoder + text-to-unit) built on the modified vocoder.
- :mod:`code_vocoder` — unit-sequence CodeHiFiGAN vocoder with duration
  predictor for incremental emission.
"""

from hifigan_tpu.models.generator import (
    Generator,
    GeneratorConfig,
    HiFiGANV1Generator,
    ODConv1d,
    ODConvTranspose1d,
    GRCLoRABlock,
    FiLM,
)
from hifigan_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    Discriminators,
)

__all__ = [
    "Generator",
    "GeneratorConfig",
    "HiFiGANV1Generator",
    "ODConv1d",
    "ODConvTranspose1d",
    "GRCLoRABlock",
    "FiLM",
    "MultiPeriodDiscriminator",
    "MultiScaleDiscriminator",
    "Discriminators",
]
