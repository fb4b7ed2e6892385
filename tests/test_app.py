"""Application layer tests: config, audio processing/VAD, engine cascade
(graceful degradation without network), offline manager, and the stdlib
REST server driven over a real socket."""

import base64
import json
import urllib.request

import numpy as np
import pytest

from hifigan_tpu.app.audio import (
    AudioProcessor,
    RealTimeAudioStream,
    chunk_audio,
    float_to_wav_bytes,
    wav_bytes_to_float,
)
from hifigan_tpu.app.config import Settings, settings_from_yaml
from hifigan_tpu.app.engine import RealTimeTranslationEngine, TranslationMode
from hifigan_tpu.app.offline import OfflineManager


def test_settings_env_overrides(monkeypatch):
    monkeypatch.setenv("HIFIGAN_TPU_PORT", "9999")
    monkeypatch.setenv("HIFIGAN_TPU_SOURCE_LANG", "es")
    s = Settings().with_env_overrides()
    assert s.web.port == 9999
    assert s.translation.source_lang == "es"


def test_settings_from_yaml(tmp_path):
    p = tmp_path / "app.yaml"
    p.write_text("web:\n  port: 1234\naudio:\n  sample_rate: 22050\n")
    s = settings_from_yaml(str(p))
    assert s.web.port == 1234
    assert s.audio.sample_rate == 22050


def test_wav_roundtrip(rng):
    audio = (rng.standard_normal(1600) * 0.3).astype(np.float32)
    data = float_to_wav_bytes(audio, 16000)
    back, sr = wav_bytes_to_float(data)
    assert sr == 16000
    np.testing.assert_allclose(back, np.clip(audio, -1, 1), atol=1e-3)


def test_vad_segments_utterance(rng):
    proc = AudioProcessor()
    sr = 16000
    t = np.arange(sr, dtype=np.float32)
    speech = 0.5 * np.sin(2 * np.pi * 220 * t / sr) * (
        1 + 0.5 * np.sin(2 * np.pi * 3 * t / sr))
    # speech frames have low ZCR + high energy; then a second of silence
    silence = np.zeros(sr, np.float32)
    assert proc.process_chunk(speech) is None or True  # may not fire yet
    utt = proc.process_chunk(silence)
    assert utt is not None and len(utt) > 0


def test_trim_silence():
    proc = AudioProcessor()
    sr = 16000
    sig = np.concatenate([
        np.zeros(sr // 2, np.float32),
        0.5 * np.sin(np.linspace(0, 440 * 2 * np.pi, sr)).astype(np.float32),
        np.zeros(sr // 2, np.float32),
    ])
    trimmed = proc.trim_silence(sig)
    assert len(trimmed) < len(sig)
    assert len(trimmed) >= sr * 0.9


def test_stream_ring_buffer(rng):
    stream = RealTimeAudioStream(max_chunks=3)
    for i in range(5):
        stream.add_chunk(np.full(10, float(i), np.float32))
    audio = stream.get_audio()
    assert len(stream) == 3
    assert audio[0] == 2.0  # oldest two chunks evicted
    assert chunk_audio(audio, 10)[0].shape == (10,)


@pytest.fixture(scope="module")
def engine():
    # zero-egress: all HF stages degrade gracefully
    return RealTimeTranslationEngine("en", "es")


def test_engine_degrades_gracefully(engine, rng):
    info = engine.get_model_info()
    assert {"asr", "mt", "tts"} <= set(info)
    result = engine.translate_text("hello world")
    assert result.translated_text == "hello world"  # identity fallback
    assert result.mode == TranslationMode.TEXT_ONLY
    audio_result = engine.translate_audio((rng.standard_normal(8000) * 0.1).astype(np.float32))
    assert audio_result.source_text == ""  # ASR unavailable
    assert audio_result.processing_time > 0


def test_engine_streaming_buffers(engine, rng):
    for _ in range(4):
        r = engine.process_streaming_audio((rng.standard_normal(1024) * 0.1).astype(np.float32))
        assert r.mode == TranslationMode.STREAMING
    flushed = engine.flush_streaming_buffers()
    assert flushed.mode == TranslationMode.STREAMING


def test_engine_switch_languages(engine):
    src, tgt = engine.source_lang, engine.target_lang
    engine.switch_languages()
    assert (engine.source_lang, engine.target_lang) == (tgt, src)
    engine.switch_languages()


def test_offline_manager(tmp_path):
    mgr = OfflineManager(base_dir=str(tmp_path))
    assert not mgr.is_model_available("vocoder")
    cap = mgr.check_offline_capability()
    assert cap["fully_offline"] is False
    for i in range(1005):
        mgr.save_translation(f"s{i}", f"t{i}", "en", "es", max_entries=1000)
    history = mgr.load_history()
    assert len(history) == 1000
    assert history[-1]["source_text"] == "s1004"
    mgr.clear_history()
    assert mgr.load_history() == []
    # vocoder availability = any file in dir
    vdir = tmp_path / "models" / "vocoder"
    vdir.mkdir(parents=True)
    (vdir / "ckpt").write_text("x")
    assert mgr.is_model_available("vocoder")


def test_stdlib_server_roundtrip(engine):
    from hifigan_tpu.app.config import Settings
    from hifigan_tpu.app.server import StdlibServer
    from dataclasses import replace

    cfg = Settings()
    cfg = replace(cfg, web=replace(cfg.web, port=0))  # ephemeral port
    srv = StdlibServer(engine=engine, cfg=cfg)
    port = srv.start(background=True)
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/api/health") as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(base + "/api/models/info") as r:
            info = json.load(r)
            assert "engine" in info and "offline" in info
        req = urllib.request.Request(
            base + "/api/translate/text",
            data=json.dumps({"text": "good morning"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
            assert out["translated_text"] == "good morning"
        # streaming chunk endpoint with a real WAV payload
        wav = float_to_wav_bytes(np.zeros(1024, np.float32))
        req = urllib.request.Request(
            base + "/api/stream/chunk",
            data=json.dumps({"type": "audio_chunk",
                             "audio": base64.b64encode(wav).decode()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert json.load(r)["type"] == "translation_update"
        # malformed body → 400, not a crash
        req = urllib.request.Request(
            base + "/api/translate/text", data=b"not json",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown route → 404
        try:
            urllib.request.urlopen(base + "/api/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_stdlib_server_static_client(engine):
    """The bundled web client (index + app.js + css) is served; path
    traversal out of static/ is rejected (parity role of the reference's
    ``app/static`` assets served by FastAPI StaticFiles)."""
    from dataclasses import replace

    from hifigan_tpu.app.config import Settings
    from hifigan_tpu.app.server import StdlibServer

    cfg = replace(Settings(), web=replace(Settings().web, port=0))
    srv = StdlibServer(engine=engine, cfg=cfg)
    port = srv.start(background=True)
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/") as r:
            page = r.read().decode()
            assert "/static/app.js" in page  # real client, not the fallback
        with urllib.request.urlopen(base + "/static/app.js") as r:
            assert r.headers["Content-Type"] == "text/javascript"
            js = r.read().decode()
            assert "TranslatorClient" in js
            assert "audio_chunk" in js and "/api/stream/chunk" in js
        with urllib.request.urlopen(base + "/static/style.css") as r:
            assert r.headers["Content-Type"] == "text/css"
        for evil in ("/static/../server.py", "/static/nope.js"):
            try:
                urllib.request.urlopen(base + evil)
                assert False, f"expected 404 for {evil}"
            except urllib.error.HTTPError as e:
                assert e.code == 404
    finally:
        srv.stop()


def test_stream_chunk_conversation(engine, rng):
    """Integration: drive the streaming endpoint the way the web client
    does — a sequence of 0.5 s base64-WAV chunks followed by silence —
    and check every reply is a well-formed translation_update (server
    side of the reference's ``/ws/translate`` audio_chunk loop)."""
    from dataclasses import replace

    from hifigan_tpu.app.config import Settings
    from hifigan_tpu.app.server import StdlibServer

    cfg = replace(Settings(), web=replace(Settings().web, port=0))
    srv = StdlibServer(engine=engine, cfg=cfg)
    port = srv.start(background=True)
    base = f"http://127.0.0.1:{port}"
    sr = 16000
    t = np.arange(sr // 2, dtype=np.float32)
    voiced = (0.4 * np.sin(2 * np.pi * 180 * t / sr)
              * (1 + 0.4 * np.sin(2 * np.pi * 4 * t / sr))).astype(np.float32)
    chunks = [voiced, voiced, np.zeros(sr // 2, np.float32)]
    try:
        for chunk in chunks:
            wav = float_to_wav_bytes(chunk, sr)
            req = urllib.request.Request(
                base + "/api/stream/chunk",
                data=json.dumps({"type": "audio_chunk",
                                 "audio": base64.b64encode(wav).decode()}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                reply = json.load(r)
            assert reply["type"] == "translation_update"
            assert set(reply) >= {"source_text", "translated_text"}
    finally:
        srv.stop()
