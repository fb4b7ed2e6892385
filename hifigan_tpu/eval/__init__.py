"""Evaluation & metrics: speaker/emotion similarity, Average Lagging,
ASR-BLEU, RTF benchmarks, batch evaluators and PASS/FAIL reports."""

from hifigan_tpu.eval.metrics import (
    cosine_similarity,
    speaker_similarity,
    emotion_similarity,
    average_lagging,
    verify_speaker,
    corpus_bleu,
)
from hifigan_tpu.eval.evaluator import (
    StreamEvaluator,
    RealTimeEvaluator,
    create_evaluation_report,
)

__all__ = [
    "cosine_similarity",
    "speaker_similarity",
    "emotion_similarity",
    "average_lagging",
    "verify_speaker",
    "corpus_bleu",
    "StreamEvaluator",
    "RealTimeEvaluator",
    "create_evaluation_report",
]
