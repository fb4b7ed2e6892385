"""Real-time translation application: cascade engine (ASR → MT → TTS →
vocoder), audio processing/VAD, offline model manager, web server
(FastAPI when available, stdlib fallback), and desktop UI."""

from hifigan_tpu.app.config import Settings, load_config, settings
from hifigan_tpu.app.audio import AudioProcessor, RealTimeAudioStream
from hifigan_tpu.app.engine import (
    RealTimeTranslationEngine,
    TranslationEngineFactory,
    TranslationMode,
    TranslationResult,
)
from hifigan_tpu.app.offline import OfflineManager, offline_manager

__all__ = [
    "Settings",
    "load_config",
    "settings",
    "AudioProcessor",
    "RealTimeAudioStream",
    "RealTimeTranslationEngine",
    "TranslationEngineFactory",
    "TranslationMode",
    "TranslationResult",
    "OfflineManager",
    "offline_manager",
]
