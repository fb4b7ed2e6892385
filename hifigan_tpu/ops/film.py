"""FiLM (feature-wise linear modulation) — fused scale/shift.

Capability parity with the reference's two FiLM variants
(``/root/reference/hifigan_modified/generator.py:174-199`` and
``/root/reference/hifigan_modified/grc_lora.py:70-129``).  Note the
reference's generator variant *sums* the 192-d speaker and 256-d emotion
embeddings (which cannot broadcast — a latent bug); following SURVEY.md
§7 we implement the stated design: **concatenate** the conditioning
embeddings, project to per-channel (γ, β), apply ``γ·x + β``.

This is a pure element-wise op — XLA fuses it into the surrounding
matmul epilogue; no Pallas needed.
"""

from __future__ import annotations

import jax

Array = jax.Array


def film(x: Array, scale: Array, shift: Array) -> Array:
    """Apply ``scale * x + shift`` with per-(batch, channel) parameters.

    Args:
      x: ``[B, T, C]`` activations.
      scale, shift: ``[B, C]``.
    """
    return (scale[:, None, :] * x + shift[:, None, :]).astype(x.dtype)
