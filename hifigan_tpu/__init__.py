"""hifigan_tpu — TPU-native expressive voice-cloning vocoder framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference project "A Modified HiFi-GAN Vocoder Using ODConv and GRC for
Expressive Voice Cloning" (see SURVEY.md): an ODConv + GRC-LoRA + FiLM
conditioned HiFi-GAN vocoder, MPD/MSD GAN training, ECAPA-TDNN /
Emotion2Vec embedding encoders, a streaming simultaneous S2ST model,
evaluation metrics (speaker SIM, emotion SIM, Average Lagging, ASR-BLEU,
RTF), and a real-time translation app server.

Layout
------
- ``ops``       low-level TPU kernels & numerics (dynamic conv, STFT/mel, Pallas)
- ``models``    flax.linen model families (generator, discriminators, encoders, S2ST)
- ``train``     GAN losses, jitted train step, checkpointing
- ``parallel``  device mesh + sharding (data/tensor parallel over ICI)
- ``streaming`` online features, chunked inference, read/write policies
- ``eval``      metrics + benchmark harness
- ``app``       translation engine + server
"""

__version__ = "0.1.0"
