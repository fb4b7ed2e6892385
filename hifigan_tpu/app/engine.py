"""The cascade translation engine (ASR → MT → TTS → vocoder).

Capability parity with ``/root/reference/app/core/translation_engine.py``:
``TranslationResult`` dataclass (``:28-38``), ``TranslationMode`` enum
(``:21-25``), model loading (``_load_models:83-121``), full-utterance
``translate_audio`` with per-stage callbacks and wall-clock timing
(``:123-195``), ``translate_text`` / ``synthesize_text``,
``process_streaming_audio`` chaining the three streaming buffers
(``:257-294``), ``flush_streaming_buffers`` (``:296-333``),
``switch_languages`` (``:346-354``) and ``TranslationEngineFactory``
(``:369-411``).

Framework improvement over the reference (SURVEY.md §1): the app-layer
TTS can route its mel output through the **modified TPU vocoder**
(jitted mel→wav with speaker/emotion conditioning) instead of bypassing
the thesis vocoder.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from hifigan_tpu.app.audio import AudioProcessor
from hifigan_tpu.app.models import (
    ASRModelFactory,
    AudioPostProcessor,
    StreamingASR,
    StreamingTranslator,
    StreamingTTS,
    TranslationPipeline,
    TTSModel,
)


class TranslationMode(enum.Enum):
    FULL = "full"
    STREAMING = "streaming"
    TEXT_ONLY = "text_only"


@dataclass
class TranslationResult:
    source_text: str = ""
    translated_text: str = ""
    audio: Optional[np.ndarray] = None
    source_lang: str = "en"
    target_lang: str = "es"
    processing_time: float = 0.0
    mode: TranslationMode = TranslationMode.FULL


def make_vocoder_synth(checkpoint_dir: Optional[str] = None, dtype=None):
    """Build a jitted mel→wav synth fn over the modified generator.

    With no trained checkpoint available, returns None (the TTS wrapper
    then falls back to its own vocoder)."""
    if checkpoint_dir is None:
        return None
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.models.generator import Generator, GeneratorConfig
    from hifigan_tpu.train import TrainConfig, create_train_state
    from hifigan_tpu.train.checkpoint import CheckpointManager

    cfg = TrainConfig()
    state, vocoder, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    state = CheckpointManager(checkpoint_dir).restore(state)
    gen_params = {"params": state.gen_params["params"]["generator"]}
    model = Generator(cfg.generator, dtype=dtype or jnp.bfloat16)

    @jax.jit
    def synth(mel, spk, emo):
        return model.apply(gen_params, mel, spk, emo)[:, 0, :]

    def fn(mel_np: np.ndarray) -> np.ndarray:
        import numpy as _np

        b = mel_np.shape[0]
        spk = _np.zeros((b, cfg.generator.speaker_dim), _np.float32)
        emo = _np.zeros((b, cfg.generator.emotion_dim), _np.float32)
        return _np.asarray(synth(mel_np, spk, emo))[0]

    return fn


class RealTimeTranslationEngine:
    def __init__(
        self,
        source_lang: str = "en",
        target_lang: str = "es",
        *,
        vocoder_checkpoint: Optional[str] = None,
        load_models: bool = True,
        asr_buffer: int = 5,
        mt_buffer: int = 3,
        tts_buffer: int = 2,
    ):
        self.source_lang = source_lang
        self.target_lang = target_lang
        self.audio_processor = AudioProcessor()
        self.post = AudioPostProcessor()
        self._buffers = (asr_buffer, mt_buffer, tts_buffer)
        self._vocoder_checkpoint = vocoder_checkpoint
        if load_models:
            self._load_models()

    def _load_models(self):
        self.asr = ASRModelFactory.create(self.source_lang)
        self.mt = TranslationPipeline(self.source_lang, self.target_lang)
        self.tts = TTSModel(
            vocoder_synth=make_vocoder_synth(self._vocoder_checkpoint)
        )
        a, m, t = self._buffers
        self.streaming_asr = StreamingASR(self.asr, a)
        self.streaming_mt = StreamingTranslator(self.mt.forward, m)
        self.streaming_tts = StreamingTTS(self.tts, t)

    # ---- full-utterance cascade ----

    def translate_audio(
        self,
        audio: np.ndarray,
        src_rate: Optional[int] = None,
        on_transcript: Optional[Callable[[str], None]] = None,
        on_translation: Optional[Callable[[str], None]] = None,
    ) -> TranslationResult:
        t0 = time.time()
        clean = self.audio_processor.preprocess(audio, src_rate)
        text = self.asr.transcribe(clean)
        if on_transcript:
            on_transcript(text)
        translated = self.mt.translate(text) if text else ""
        if on_translation:
            on_translation(translated)
        wav = self.tts.synthesize(translated) if translated else np.zeros(0, np.float32)
        if wav.size:
            wav = self.post.process(wav)
        return TranslationResult(
            source_text=text,
            translated_text=translated,
            audio=wav,
            source_lang=self.source_lang,
            target_lang=self.target_lang,
            processing_time=time.time() - t0,
            mode=TranslationMode.FULL,
        )

    def translate_text(self, text: str) -> TranslationResult:
        t0 = time.time()
        translated = self.mt.translate(text)
        return TranslationResult(
            source_text=text,
            translated_text=translated,
            source_lang=self.source_lang,
            target_lang=self.target_lang,
            processing_time=time.time() - t0,
            mode=TranslationMode.TEXT_ONLY,
        )

    def synthesize_text(self, text: str) -> TranslationResult:
        t0 = time.time()
        wav = self.tts.synthesize(text)
        return TranslationResult(
            translated_text=text,
            audio=wav,
            processing_time=time.time() - t0,
            mode=TranslationMode.FULL,
        )

    # ---- streaming cascade ----

    def process_streaming_audio(self, chunk: np.ndarray) -> TranslationResult:
        t0 = time.time()
        result = TranslationResult(
            source_lang=self.source_lang, target_lang=self.target_lang,
            mode=TranslationMode.STREAMING,
        )
        text = self.streaming_asr.add_audio_chunk(chunk)
        if text:
            result.source_text = text
            translated = self.streaming_mt.add_text_chunk(text)
            if translated:
                result.translated_text = translated
                wav = self.streaming_tts.add_text_chunk(translated)
                if wav is not None and wav.size:
                    result.audio = wav
        result.processing_time = time.time() - t0
        return result

    def flush_streaming_buffers(self) -> TranslationResult:
        t0 = time.time()
        result = TranslationResult(
            source_lang=self.source_lang, target_lang=self.target_lang,
            mode=TranslationMode.STREAMING,
        )
        text = self.streaming_asr.flush()
        if text:
            result.source_text = text
            translated = self.streaming_mt.model.translate(text)
            if translated:
                result.translated_text = translated
        pending = self.streaming_mt.flush()
        if pending:
            result.translated_text = (result.translated_text + " " + pending).strip()
        if result.translated_text:
            wav = self.streaming_tts.tts.synthesize(result.translated_text)
            if wav.size:
                result.audio = wav
        leftover = self.streaming_tts.flush()
        if leftover is not None and leftover.size and result.audio is None:
            result.audio = leftover
        result.processing_time = time.time() - t0
        return result

    def switch_languages(self):
        """Swap direction and reload models (reference ``:346-354``)."""
        self.source_lang, self.target_lang = self.target_lang, self.source_lang
        self._load_models()

    def get_model_info(self) -> dict:
        return {
            "source_lang": self.source_lang,
            "target_lang": self.target_lang,
            "asr": {"model": self.asr.model_name, "available": self.asr.available},
            "mt": {"model": self.mt.forward.model_name,
                   "available": self.mt.forward.available},
            "tts": {"model": self.tts.model_name, "available": self.tts.available,
                    "uses_framework_vocoder": self.tts.vocoder_synth is not None},
        }


class TranslationEngineFactory:
    _cache: dict = {}

    @classmethod
    def create(cls, source_lang: str = "en", target_lang: str = "es", **kw):
        key = (source_lang, target_lang, tuple(sorted(kw.items())))
        if key not in cls._cache:
            cls._cache[key] = RealTimeTranslationEngine(source_lang, target_lang, **kw)
        return cls._cache[key]
