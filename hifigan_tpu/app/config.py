"""Application configuration.

Capability parity with ``/root/reference/app/core/config.py``: grouped
audio / model / translation / web settings (``AudioConfig:11-20``,
``ModelConfig:23-42``, ``TranslationConfig:45-54``, ``WebConfig:57-62``)
merged into one ``Settings`` object with environment-variable overrides
(``HIFIGAN_TPU_<FIELD>``), plus a YAML loader (``load_config:101-106``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields, replace
from typing import Any, Dict, Optional


@dataclass
class AudioSettings:
    sample_rate: int = 16_000
    channels: int = 1
    chunk_size: int = 1024
    format: str = "int16"
    max_duration_s: float = 30.0


@dataclass
class ModelSettings:
    # HF checkpoints per stage (reference ModelConfig)
    asr_model: str = "facebook/wav2vec2-large-960h-lv60-self"
    mt_model_en_es: str = "Helsinki-NLP/opus-mt-en-es"
    mt_model_es_en: str = "Helsinki-NLP/opus-mt-es-en"
    tts_model: str = "microsoft/speecht5_tts"
    vocoder_checkpoint: Optional[str] = None  # orbax dir for our generator
    use_tpu: bool = True


@dataclass
class TranslationSettings:
    source_lang: str = "en"
    target_lang: str = "es"
    beam_size: int = 5
    no_repeat_ngram: int = 2
    streaming_asr_buffer: int = 5
    streaming_mt_buffer: int = 3
    streaming_tts_buffer: int = 2


@dataclass
class WebSettings:
    host: str = "127.0.0.1"
    port: int = 8000
    cors_origins: tuple = ("*",)


@dataclass
class Settings:
    app_name: str = "hifigan-tpu-translator"
    version: str = "0.1.0"
    audio: AudioSettings = field(default_factory=AudioSettings)
    models: ModelSettings = field(default_factory=ModelSettings)
    translation: TranslationSettings = field(default_factory=TranslationSettings)
    web: WebSettings = field(default_factory=WebSettings)

    def with_env_overrides(self, prefix: str = "HIFIGAN_TPU_") -> "Settings":
        """Flat env overrides: HIFIGAN_TPU_PORT, HIFIGAN_TPU_SOURCE_LANG, …"""
        out = self
        for section_name in ("audio", "models", "translation", "web"):
            section = getattr(out, section_name)
            updates = {}
            for f in fields(section):
                env = os.environ.get(prefix + f.name.upper())
                if env is not None:
                    cur = getattr(section, f.name)
                    if isinstance(cur, bool):
                        updates[f.name] = env.lower() in ("1", "true", "yes")
                    elif isinstance(cur, int):
                        updates[f.name] = int(env)
                    elif isinstance(cur, float):
                        updates[f.name] = float(env)
                    else:
                        updates[f.name] = env
            if updates:
                out = replace(out, **{section_name: replace(section, **updates)})
        return out


def load_config(path: str) -> Dict[str, Any]:
    """Load a YAML config file (reference ``load_config``)."""
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def settings_from_yaml(path: str) -> Settings:
    raw = load_config(path) or {}
    s = Settings()
    for section_name in ("audio", "models", "translation", "web"):
        if section_name in raw and isinstance(raw[section_name], dict):
            section = getattr(s, section_name)
            known = {f.name for f in fields(section)}
            updates = {k: v for k, v in raw[section_name].items() if k in known}
            s = replace(s, **{section_name: replace(section, **updates)})
    return s.with_env_overrides()


settings = Settings().with_env_overrides()
