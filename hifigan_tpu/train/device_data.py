"""On-device training data: the whole corpus lives in HBM and random
crops are sampled *inside* the jitted train program.

Motivation (measured on the v5e relay rig): shipping ``[K, B, 8192]``
float32 audio per fused train call costs ~570 ms of host→device
transfer — 2.7× the device compute it feeds.  With the corpus resident
in HBM (512 formant utterances ≈ 70 MB) the per-call host traffic drops
to one PRNG key, and batch assembly becomes a vmapped
``dynamic_slice`` fused into the training program.

The reference's ``torch.utils.data`` loader has no counterpart for
this; it is the TPU-native replacement for its audio dataset pipeline
(``/root/reference/hifigan_modified/complete_vocoder.py`` training
loop's host-side batching).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def build_audio_bank(dataset, *, pad_to_multiple: int = 128) -> Tuple[np.ndarray, np.ndarray]:
    """Materialise every utterance of a dataset with an ``_utterance``
    accessor (e.g. :class:`FormantSpeechDataset`) into one zero-padded
    ``[N, L_max]`` float32 array plus true lengths ``[N]``."""
    utts = [np.asarray(dataset._utterance(i), np.float32)
            for i in range(len(dataset))]
    lengths = np.array([len(u) for u in utts], np.int32)
    L = int(lengths.max())
    L = -(-L // pad_to_multiple) * pad_to_multiple
    bank = np.zeros((len(utts), L), np.float32)
    for i, u in enumerate(utts):
        bank[i, : len(u)] = u
    return bank, lengths


def make_device_sampler(
    bank: Array,          # [N, L] device-resident audio
    lengths: Array,       # [N] true lengths
    segment_samples: int,
    batch_size: int,
) -> Callable[[Array], Array]:
    """Returns ``sample(key) -> [batch, segment_samples]`` — a traced
    function drawing random (utterance, offset) crops from the HBM bank.
    Offsets stay within each utterance's true length (short utterances
    fall back to offset 0 over the zero-padded row, matching the host
    loader's pad-to-segment behaviour)."""
    n = bank.shape[0]
    seg = segment_samples

    def sample(key: Array) -> Array:
        k_utt, k_off = jax.random.split(key)
        utt = jax.random.randint(k_utt, (batch_size,), 0, n)
        span = jnp.maximum(lengths[utt] - seg, 1)
        off = (jax.random.uniform(k_off, (batch_size,)) * span).astype(jnp.int32)

        def crop(u, o):
            return jax.lax.dynamic_slice(bank[u], (o,), (seg,))

        return jax.vmap(crop)(utt, off)

    return sample
