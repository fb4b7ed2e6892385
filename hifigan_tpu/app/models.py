"""Cascade-stage model wrappers: ASR, MT, TTS.

Capability parity with ``/root/reference/app/models/``:

* :class:`ASRModel` / :class:`StreamingASR` / :class:`ASRModelFactory`
  (``asr_model.py``: wav2vec2-CTC transcription ``:58-101``, N-chunk
  streaming buffer ``:149-210``, lang registry ``:217-221``);
* :class:`TranslationModel` / :class:`TranslationPipeline` /
  :class:`StreamingTranslator` (``translation_model.py``: MarianMT
  beam-5, no-repeat-ngram 2 ``:86-93``; bidirectional pipeline
  ``:143-196``; text-chunk buffer ``:199-269``; 4 lang pairs ``:276-281``);
* :class:`TTSModel` / :class:`StreamingTTS` / :class:`AudioPostProcessor`
  (``tts_model.py``), with the key difference that **synthesis runs
  through the framework's own TPU vocoder** when a trained checkpoint is
  available (the reference's app bypasses its thesis vocoder entirely —
  SURVEY.md §1 key observation; we unify them).

All HF-backed stages degrade gracefully (reference idiom, SURVEY.md
§5.3): ASR returns "" / MT echoes the source / TTS returns silence when
the external model cannot be loaded (zero-egress environments).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, List, Optional

import numpy as np

from hifigan_tpu.streaming.features import resample_linear

log = logging.getLogger(__name__)


def _hf_kwargs() -> dict:
    """Offline-first model loading: only hit the network when the user
    explicitly opts in (HIFIGAN_TPU_ALLOW_DOWNLOADS=1).  In zero-egress
    environments a network attempt hangs; local_files_only fails fast."""
    if os.environ.get("HIFIGAN_TPU_ALLOW_DOWNLOADS", "").lower() in ("1", "true"):
        return {}
    return {"local_files_only": True}


class ASRModel:
    """wav2vec2-CTC transcription (HF torch backend, greedy decode)."""

    def __init__(self, model_name: str, sample_rate: int = 16_000):
        self.model_name = model_name
        self.sample_rate = sample_rate
        self._backend = None
        try:
            from hifigan_tpu.eval.asr import HFTranscriber

            self._backend = HFTranscriber(model_name=model_name, sample_rate=sample_rate)
        except KeyboardInterrupt:
            raise
        except Exception as e:  # graceful degradation
            log.warning("ASR model %s unavailable (%s); transcribe → ''", model_name, e)

    @property
    def available(self) -> bool:
        return self._backend is not None

    def transcribe(self, audio: np.ndarray, src_rate: Optional[int] = None) -> str:
        if self._backend is None:
            return ""
        if src_rate and src_rate != self.sample_rate:
            audio = resample_linear(audio, src_rate, self.sample_rate)
        try:
            return self._backend(audio)
        except Exception as e:
            log.error("ASR failed: %s", e)
            return ""


class StreamingASR:
    """Buffer N chunks then transcribe the concatenation (reference
    ``asr_model.py:149-210``)."""

    def __init__(self, asr: ASRModel, buffer_chunks: int = 5):
        self.asr = asr
        self.buffer_chunks = buffer_chunks
        self._chunks: List[np.ndarray] = []

    def add_audio_chunk(self, chunk: np.ndarray) -> Optional[str]:
        self._chunks.append(np.asarray(chunk, np.float32).reshape(-1))
        if len(self._chunks) >= self.buffer_chunks:
            return self.flush()
        return None

    def flush(self) -> Optional[str]:
        if not self._chunks:
            return None
        audio = np.concatenate(self._chunks)
        self._chunks = []
        return self.asr.transcribe(audio)


class ASRModelFactory:
    REGISTRY = {
        "en": "facebook/wav2vec2-large-960h-lv60-self",
        "es": "facebook/wav2vec2-large-960h-lv60-self",
    }

    @classmethod
    def create(cls, lang: str) -> ASRModel:
        return ASRModel(cls.REGISTRY.get(lang, cls.REGISTRY["en"]))


class TranslationModel:
    """MarianMT text translation."""

    def __init__(self, model_name: str, *, beam_size: int = 5, no_repeat_ngram: int = 2):
        self.model_name = model_name
        self.beam_size = beam_size
        self.no_repeat_ngram = no_repeat_ngram
        self._model = self._tok = None
        try:
            from transformers import MarianMTModel, MarianTokenizer

            self._tok = MarianTokenizer.from_pretrained(model_name, **_hf_kwargs())
            self._model = MarianMTModel.from_pretrained(model_name, **_hf_kwargs())
            self._model.eval()
        except Exception as e:
            log.warning("MT model %s unavailable (%s); translate → identity", model_name, e)

    @property
    def available(self) -> bool:
        return self._model is not None

    def translate(self, text: str) -> str:
        if not text.strip():
            return ""
        if self._model is None:
            return text  # reference idiom: return source on failure
        try:
            import torch

            batch = self._tok([text], return_tensors="pt", padding=True)
            with torch.no_grad():
                out = self._model.generate(
                    **batch, num_beams=self.beam_size,
                    no_repeat_ngram_size=self.no_repeat_ngram,
                )
            return self._tok.batch_decode(out, skip_special_tokens=True)[0]
        except Exception as e:
            log.error("MT failed: %s", e)
            return text


class TranslationPipeline:
    """Holds both directions of a language pair (reference :143-196)."""

    PAIRS = {
        ("en", "es"): "Helsinki-NLP/opus-mt-en-es",
        ("es", "en"): "Helsinki-NLP/opus-mt-es-en",
        ("en", "fr"): "Helsinki-NLP/opus-mt-en-fr",
        ("fr", "en"): "Helsinki-NLP/opus-mt-fr-en",
    }

    def __init__(self, source_lang: str = "en", target_lang: str = "es", **kw):
        self.source_lang, self.target_lang = source_lang, target_lang
        self.forward = TranslationModel(
            self.PAIRS.get((source_lang, target_lang), self.PAIRS[("en", "es")]), **kw
        )
        self.backward = TranslationModel(
            self.PAIRS.get((target_lang, source_lang), self.PAIRS[("es", "en")]), **kw
        )

    def translate(self, text: str, reverse: bool = False) -> str:
        return (self.backward if reverse else self.forward).translate(text)


class StreamingTranslator:
    """Buffer text chunks, translate when full (reference :199-269)."""

    def __init__(self, model: TranslationModel, buffer_chunks: int = 3):
        self.model = model
        self.buffer_chunks = buffer_chunks
        self._chunks: List[str] = []

    def add_text_chunk(self, text: str) -> Optional[str]:
        if text.strip():
            self._chunks.append(text.strip())
        if len(self._chunks) >= self.buffer_chunks:
            return self.flush()
        return None

    def flush(self) -> Optional[str]:
        if not self._chunks:
            return None
        text = " ".join(self._chunks)
        self._chunks = []
        return self.model.translate(text)


class TTSModel:
    """Text-to-speech synthesis.

    Primary backend: HF SpeechT5 mel generation → **our TPU vocoder**
    (when a vocoder synth fn is provided); fallback: SpeechT5's own
    vocoder; last resort: silence."""

    def __init__(self, model_name: str = "microsoft/speecht5_tts",
                 vocoder_synth: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 sample_rate: int = 16_000):
        self.model_name = model_name
        self.vocoder_synth = vocoder_synth
        self.sample_rate = sample_rate
        self._backend = None
        try:
            import torch
            from transformers import SpeechT5ForTextToSpeech, SpeechT5Processor, SpeechT5HifiGan

            self._processor = SpeechT5Processor.from_pretrained(model_name, **_hf_kwargs())
            self._model = SpeechT5ForTextToSpeech.from_pretrained(model_name, **_hf_kwargs())
            self._hf_vocoder = SpeechT5HifiGan.from_pretrained(
                "microsoft/speecht5_hifigan", **_hf_kwargs())
            self._model.eval()
            self._backend = "speecht5"
        except Exception as e:
            log.warning("TTS model %s unavailable (%s); synthesize → silence", model_name, e)

    @property
    def available(self) -> bool:
        return self._backend is not None

    def synthesize(self, text: str) -> np.ndarray:
        if not text.strip() or self._backend is None:
            return np.zeros(0, np.float32)
        try:
            import torch

            inputs = self._processor(text=text, return_tensors="pt")
            spk = torch.zeros((1, 512))
            with torch.no_grad():
                mel = self._model.generate_speech(inputs["input_ids"], spk)  # [T, 80]
            if self.vocoder_synth is not None:
                return np.asarray(self.vocoder_synth(mel.numpy().T[None]))  # [1,80,T]
            with torch.no_grad():
                wav = self._hf_vocoder(mel)
            return wav.numpy().reshape(-1)
        except Exception as e:
            log.error("TTS failed: %s", e)
            return np.zeros(0, np.float32)


class StreamingTTS:
    """Buffer text chunks then synthesize (reference ``tts_model.py:191-255``)."""

    def __init__(self, tts: TTSModel, buffer_chunks: int = 2):
        self.tts = tts
        self.buffer_chunks = buffer_chunks
        self._chunks: List[str] = []

    def add_text_chunk(self, text: str) -> Optional[np.ndarray]:
        if text.strip():
            self._chunks.append(text.strip())
        if len(self._chunks) >= self.buffer_chunks:
            return self.flush()
        return None

    def flush(self) -> Optional[np.ndarray]:
        if not self._chunks:
            return None
        text = " ".join(self._chunks)
        self._chunks = []
        return self.tts.synthesize(text)


class AudioPostProcessor:
    """Resample / normalise / trim / WAV-bytes (reference ``tts_model.py:258-303``)."""

    def __init__(self, sample_rate: int = 16_000):
        self.sample_rate = sample_rate

    def process(self, audio: np.ndarray, src_rate: Optional[int] = None) -> np.ndarray:
        from hifigan_tpu.app.audio import AudioProcessor

        return AudioProcessor(self.sample_rate).preprocess(audio, src_rate)

    def to_wav_bytes(self, audio: np.ndarray) -> bytes:
        from hifigan_tpu.app.audio import float_to_wav_bytes

        return float_to_wav_bytes(audio, self.sample_rate)
