"""Evaluation metrics.

Capability parity with
``/root/reference/evaluation/evaluation_framework.py:20-146``
(``EvaluationMetrics``: cosine similarity, ECAPA speaker similarity,
Emotion2Vec emotion similarity, Average Lagging, ASR-BLEU) and the
speaker-verification utilities of
``/root/reference/speaker_embedding/ecapa_tdnn.py:198-225``
(cosine + 0.7 decision threshold).

TPU-first: similarity metrics take a jitted embedding function (one
compiled program evaluates a whole batch of audio pairs); BLEU is
host-side (sacrebleu when available, with a self-contained fallback).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SPEAKER_VERIFICATION_THRESHOLD = 0.7  # reference ecapa_tdnn.py:212-225


def cosine_similarity(a: Array, b: Array, axis: int = -1) -> Array:
    """Cosine similarity along ``axis`` (reference ``:26-44``)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    num = jnp.sum(a * b, axis=axis)
    den = jnp.linalg.norm(a, axis=axis) * jnp.linalg.norm(b, axis=axis)
    return num / jnp.clip(den, 1e-9)


def speaker_similarity(
    embed_fn: Callable[[Array], Array], source_mel: Array, generated_mel: Array
) -> Array:
    """Cosine similarity of speaker embeddings of source vs generated
    audio (reference ``:46-68`` — embeddings from ECAPA).

    ``embed_fn``: jitted ``mel → [B, D]`` speaker encoder.
    """
    return cosine_similarity(embed_fn(source_mel), embed_fn(generated_mel))


def emotion_similarity(
    embed_fn: Callable[[Array], Array], source_mel: Array, generated_mel: Array
) -> Array:
    """Cosine similarity of emotion embeddings (reference ``:70-92``)."""
    return cosine_similarity(embed_fn(source_mel), embed_fn(generated_mel))


def verify_speaker(
    emb_a: Array, emb_b: Array, threshold: float = SPEAKER_VERIFICATION_THRESHOLD
):
    """Same-speaker decision: cosine ≥ threshold (reference
    ``speaker_embedding/ecapa_tdnn.py:198-225``)."""
    sim = cosine_similarity(emb_a, emb_b)
    return sim >= threshold, sim


def average_lagging(
    source_timestamps: Sequence[float], target_timestamps: Sequence[float]
) -> float:
    """Average Lagging: mean delay between each emitted target event and
    its source-side timestamp (reference ``:94-118`` — mean(tgt − src)
    over aligned positions)."""
    n = min(len(source_timestamps), len(target_timestamps))
    if n == 0:
        return 0.0
    src = np.asarray(source_timestamps[:n], dtype=np.float64)
    tgt = np.asarray(target_timestamps[:n], dtype=np.float64)
    return float(np.mean(tgt - src))


def real_time_factor(audio_seconds: float, wall_seconds: float) -> float:
    """Audio seconds generated per wall-clock second (the BASELINE.json
    headline metric)."""
    return audio_seconds / max(wall_seconds, 1e-12)


# --------------------------------------------------------------------------
# BLEU (host side)
# --------------------------------------------------------------------------


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def _bleu_fallback(hypotheses: Sequence[str], references: Sequence[str], max_n: int = 4) -> float:
    """Self-contained corpus BLEU (uniform 4-gram weights, closest-length
    brevity penalty) for environments without sacrebleu."""
    clipped = [0] * max_n
    total = [0] * max_n
    hyp_len = ref_len = 0
    for hyp, ref in zip(hypotheses, references):
        h = hyp.split()
        r = ref.split()
        hyp_len += len(h)
        ref_len += len(r)
        for n in range(1, max_n + 1):
            hc = _ngrams(h, n)
            rc = _ngrams(r, n)
            total[n - 1] += max(0, len(h) - n + 1)
            clipped[n - 1] += sum(min(c, rc[g]) for g, c in hc.items())
    if min(total) == 0 or min(clipped) == 0:
        return 0.0
    log_p = sum(math.log(c / t) for c, t in zip(clipped, total)) / max_n
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return 100.0 * bp * math.exp(log_p)


def corpus_bleu(hypotheses: Sequence[str], references: Sequence[str]) -> float:
    """Corpus BLEU, preferring sacrebleu (the reference's scorer —
    ``/root/reference/asr_bleu/compute_asr_bleu.py:158``)."""
    try:
        import sacrebleu

        return float(sacrebleu.corpus_bleu(list(hypotheses), [list(references)]).score)
    except Exception:
        return _bleu_fallback(hypotheses, references)


def asr_bleu(
    transcribe_fn: Callable[[np.ndarray], str],
    generated_audio: Sequence[np.ndarray],
    reference_texts: Sequence[str],
) -> float:
    """ASR-BLEU: transcribe generated audio, score against references
    (reference ``evaluation_framework.py:120-146``).

    ``transcribe_fn``: audio → text (e.g. the gated HF wav2vec2 wrapper in
    :mod:`hifigan_tpu.eval.asr`)."""
    hyps = [transcribe_fn(a).strip().lower() for a in generated_audio]
    refs = [t.strip().lower() for t in reference_texts]
    return corpus_bleu(hyps, refs)


# --------------------------------------------------------------------------
# Mel-cepstral distortion (fidelity metric for BASELINE.json parity)
# --------------------------------------------------------------------------


def mel_l1(mel_a: Array, mel_b: Array) -> float:
    return float(jnp.mean(jnp.abs(mel_a.astype(jnp.float32) - mel_b.astype(jnp.float32))))


def mcd(log_mel_a: np.ndarray, log_mel_b: np.ndarray) -> float:
    """Mel-cepstral distortion (dB) between two aligned log-mel
    spectrograms via DCT cepstra (coefficients 1..13)."""
    from scipy.fftpack import dct

    ca = dct(np.asarray(log_mel_a), axis=-1, norm="ortho")[..., 1:14]
    cb = dct(np.asarray(log_mel_b), axis=-1, norm="ortho")[..., 1:14]
    diff = ca - cb
    return float(
        np.mean(np.sqrt(np.sum(diff**2, axis=-1))) * (10.0 / np.log(10)) * np.sqrt(2.0)
    )
