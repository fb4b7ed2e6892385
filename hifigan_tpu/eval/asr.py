"""ASR transcription backends for ASR-BLEU evaluation.

Capability parity with the reference's ASR-BLEU toolkit
(``/root/reference/asr_bleu/utils.py:47-306``): a wav2vec2-CTC
transcriber (HF backend, greedy/argmax decode — the reference uses a
beam-1 lexicon-free torchaudio decoder, equivalent to argmax for beam 1)
plus a per-language model registry mirroring
``/root/reference/asr_bleu/asr_model_cfgs.json``.

Model weights require network or a local cache; in zero-egress
environments construction raises and callers fall back to
``NullTranscriber`` (tests inject synthetic transcripts).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# per-language HF checkpoints (reference asr_model_cfgs.json registry;
# en mirrors the LV-60 self-trained wav2vec2 the reference uses)
ASR_MODEL_REGISTRY = {
    "en": "facebook/wav2vec2-large-960h-lv60-self",
    "es": "jonatasgrosman/wav2vec2-large-xlsr-53-spanish",
    "fr": "jonatasgrosman/wav2vec2-large-xlsr-53-french",
    "de": "jonatasgrosman/wav2vec2-large-xlsr-53-german",
    "zh": "jonatasgrosman/wav2vec2-large-xlsr-53-chinese-zh-cn",
}


class HFTranscriber:
    """HuggingFace wav2vec2-CTC transcriber (torch CPU backend)."""

    def __init__(self, lang: str = "en", model_name: Optional[str] = None,
                 sample_rate: int = 16_000):
        import os

        import torch  # gated: torch is CPU-only in this image
        from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor

        kw = ({} if os.environ.get("HIFIGAN_TPU_ALLOW_DOWNLOADS", "").lower()
              in ("1", "true") else {"local_files_only": True})
        self._torch = torch
        name = model_name or ASR_MODEL_REGISTRY[lang]
        self.processor = Wav2Vec2Processor.from_pretrained(name, **kw)
        self.model = Wav2Vec2ForCTC.from_pretrained(name, **kw)
        self.model.eval()
        self.sample_rate = sample_rate

    def __call__(self, audio: np.ndarray) -> str:
        torch = self._torch
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        peak = np.abs(audio).max()
        if peak > 0:
            audio = audio / peak
        inputs = self.processor(
            audio, sampling_rate=self.sample_rate, return_tensors="pt"
        )
        with torch.no_grad():
            logits = self.model(inputs.input_values).logits
        ids = logits.argmax(dim=-1)
        return self.processor.batch_decode(ids)[0].strip().lower()


class NullTranscriber:
    """Deterministic placeholder for offline environments: returns the
    injected transcript table or empty strings (mirrors the reference's
    graceful-degradation idiom, SURVEY.md §5.3)."""

    def __init__(self, table: Optional[dict] = None):
        self.table = table or {}
        self._count = 0

    def __call__(self, audio: np.ndarray) -> str:
        key = self._count
        self._count += 1
        return self.table.get(key, "")


def make_transcriber(lang: str = "en", model_name: Optional[str] = None):
    """Best-effort transcriber: HF when weights are reachable, else None."""
    try:
        return HFTranscriber(lang, model_name)
    except Exception:
        return None
