"""Complete vocoder facade: generator + embedding auto-extraction.

Capability parity with
``/root/reference/hifigan_modified/complete_vocoder.py:21-82``
(``ModifiedHiFiGANVocoder``): when speaker/emotion embeddings are not
supplied, they are extracted from the input mel by the bundled
ECAPA-TDNN / Emotion2Vec encoders, then the modified generator
synthesises the waveform.

Also provides the conditioned facade with *pretrained-encoder* hooks of
``/root/reference/hifigan_modified/conditioned_hifigan.py`` (there the
encoders are disabled and replaced by ``torch.randn`` dummies at
``:111-147``; here the native encoders are always live — deviation
recorded).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.models.embeddings import EmbeddingExtractor
from hifigan_tpu.models.generator import Generator, GeneratorConfig

Array = jax.Array


class ModifiedVocoder(nn.Module):
    """Generator + embedding extractor bundle.

    ``__call__(mel [B,80,T], spk?, emo?) → dict(waveform, speaker_embedding,
    emotion_embedding)`` — reference API ``complete_vocoder.py:49-82``."""

    config: GeneratorConfig = GeneratorConfig()
    ecapa_channels: int = 512
    emo_hidden: int = 512
    emo_layers: int = 6
    emo_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        mel: Array,
        speaker_emb: Optional[Array] = None,
        emotion_emb: Optional[Array] = None,
        reference_mel: Optional[Array] = None,
    ) -> dict:
        """``reference_mel``: when given, embeddings are auto-extracted
        from this clip instead of the content mel — the voice-cloning
        API (clone the reference clip's voice onto ``mel``'s content).
        Parameter structure is identical either way, so copy-synthesis
        and cloning checkpoints are interchangeable."""
        if speaker_emb is None or emotion_emb is None:
            ext_spk, ext_emo = EmbeddingExtractor(
                speaker_dim=self.config.speaker_dim,
                emotion_dim=self.config.emotion_dim,
                n_mels=self.config.input_channels,
                ecapa_channels=self.ecapa_channels,
                emo_hidden=self.emo_hidden,
                emo_layers=self.emo_layers,
                emo_heads=self.emo_heads,
                dtype=self.dtype,
                name="embedding_extractor",
            )(mel if reference_mel is None else reference_mel)
            speaker_emb = speaker_emb if speaker_emb is not None else ext_spk
            emotion_emb = emotion_emb if emotion_emb is not None else ext_emo
        wav = Generator(self.config, dtype=self.dtype, name="generator")(
            mel, speaker_emb, emotion_emb
        )
        return {
            "waveform": wav,
            "speaker_embedding": speaker_emb,
            "emotion_embedding": emotion_emb,
        }
