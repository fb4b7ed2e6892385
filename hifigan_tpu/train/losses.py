"""GAN loss functions (LSGAN + feature matching + mel reconstruction).

Reference semantics (``/root/reference/hifigan_modified/complete_vocoder.py``):

* generator adversarial: MSE of every MPD/MSD head's *fake* output to 1
  (``:98-110``);
* feature matching: L1 between fake and (stop-gradient) real head
  outputs, weight 10 (``:112-124``, ``:46``).  The reference computes FM
  on *final* outputs only; deep feature matching over the intermediate
  LeakyReLU maps (standard HiFi-GAN) is available via
  ``deep_feature_matching=True``;
* mel loss: L1 between the mel of the generated audio and the input
  mel, weight 45 (``:126-127``, ``:47``) — computed with a **real**
  STFT→mel here (the reference substitutes the input mel,
  ``:210-212``);
* discriminator: MSE real→1, fake→0 over all heads (``:145-176``).

All reductions in fp32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass(frozen=True)
class LossWeights:
    """Defaults per reference ``complete_vocoder.py:46-47``.  The
    alternative trainer profile (``conditioned_hifigan.py:245-250``) is
    feature 45 / mel 45 / adversarial 1 with hinge adversarial loss —
    select via ``LossWeights(feature_matching=45.0, adversarial_type="hinge")``."""

    feature_matching: float = 10.0
    mel: float = 45.0
    adversarial: float = 1.0
    multi_res_stft: float = 0.0  # optional auxiliary loss (ops/stft.py)
    adversarial_type: str = "lsgan"  # "lsgan" | "hinge"


def _mse_to(outputs: List[Array], target: float) -> Array:
    total = 0.0
    for o in outputs:
        total = total + jnp.mean(jnp.square(o.astype(jnp.float32) - target))
    return total


def generator_adversarial_loss(
    fake_outputs: List[Array], kind: str = "lsgan"
) -> Array:
    """LSGAN: Σ heads MSE(fake, 1); hinge: Σ heads −mean(fake)
    (the conditioned_hifigan trainer's hinge loss, :210-299)."""
    if kind == "hinge":
        total = 0.0
        for o in fake_outputs:
            total = total - jnp.mean(o.astype(jnp.float32))
        return total
    return _mse_to(fake_outputs, 1.0)


def discriminator_loss(
    real_outputs: List[Array], fake_outputs: List[Array], kind: str = "lsgan"
) -> Array:
    """LSGAN: Σ MSE(real,1)+MSE(fake,0); hinge: Σ mean(relu(1−real)) +
    mean(relu(1+fake))."""
    if kind == "hinge":
        total = 0.0
        for r, f in zip(real_outputs, fake_outputs):
            total = total + jnp.mean(jax.nn.relu(1.0 - r.astype(jnp.float32)))
            total = total + jnp.mean(jax.nn.relu(1.0 + f.astype(jnp.float32)))
        return total
    return _mse_to(real_outputs, 1.0) + _mse_to(fake_outputs, 0.0)


def feature_matching_loss(
    real: List[Array] | List[List[Array]],
    fake: List[Array] | List[List[Array]],
) -> Array:
    """L1 between fake and stop-gradient(real) activations.

    Accepts either final outputs (reference semantics) or nested
    per-layer feature lists (deep FM)."""
    total = 0.0
    for r, f in zip(real, fake):
        if isinstance(r, (list, tuple)):
            for ri, fi in zip(r, f):
                total = total + jnp.mean(
                    jnp.abs(fi.astype(jnp.float32) - jax.lax.stop_gradient(ri).astype(jnp.float32))
                )
        else:
            total = total + jnp.mean(
                jnp.abs(f.astype(jnp.float32) - jax.lax.stop_gradient(r).astype(jnp.float32))
            )
    return total


def mel_l1_loss(generated_mel: Array, target_mel: Array) -> Array:
    return jnp.mean(jnp.abs(generated_mel.astype(jnp.float32) - target_mel.astype(jnp.float32)))
