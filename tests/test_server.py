"""HTTP server tests with a stub engine (mirrors reference tests/test_server.py
behaviors: healthz/readyz, /tts WAV payload, /tts/stream chunked PCM, 429)."""

import asyncio
import json
import threading
import time
import urllib.request
import urllib.error

import numpy as np
import pytest

from indextts_tpu.runtime.server import ServerSettings, TTSServer


def stub_engine(text="", **kw):
    time.sleep(0.05)
    sr = 22050
    t = np.linspace(0, 0.2, int(sr * 0.2), endpoint=False)
    return {"audio": (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
            "sampling_rate": sr}


def stub_stream(text="", **kw):
    for _ in range(3):
        yield (np.zeros(1024, np.float32))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    settings = ServerSettings(
        host="127.0.0.1", port=18321, max_concurrency=1,
        cache_dir=str(tmp_path_factory.mktemp("cache")),
    )
    srv = TTSServer(stub_engine, settings, stream_fn=stub_stream)
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.serve())

    th = threading.Thread(target=run, daemon=True)
    th.start()
    for _ in range(100):
        if srv.ready:
            break
        time.sleep(0.05)
    yield srv
    loop.call_soon_threadsafe(loop.stop)


def _get(path):
    return urllib.request.urlopen(f"http://127.0.0.1:18321{path}", timeout=5)


def _post(path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:18321{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=10)


def test_healthz(server):
    r = _get("/healthz")
    assert r.status == 200
    assert json.loads(r.read())["status"] == "ok"


def test_readyz(server):
    r = _get("/readyz")
    assert r.status == 200


def test_tts_wav(server):
    r = _post("/tts", {"text": "hello"})
    assert r.status == 200
    data = r.read()
    assert data[:4] == b"RIFF"
    assert r.headers["Content-Type"] == "audio/wav"


def test_tts_cache_hit(server):
    r1 = _post("/tts", {"text": "cache me"})
    b1 = r1.read()
    r2 = _post("/tts", {"text": "cache me"})
    b2 = r2.read()
    assert b1 == b2


def test_tts_missing_text(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post("/tts", {})
    assert e.value.code == 400


def test_tts_stream(server):
    r = _post("/tts/stream", {"text": "hello"})
    assert r.status == 200
    data = r.read()
    # 3 chunks x 1024 samples x 2 bytes
    assert len(data) == 3 * 2048


def test_stream_disconnect_does_not_strand_producer():
    """ADVICE r1: a client disconnect mid-stream must terminate the producer
    thread (previously it blocked forever on a full bounded queue, exhausting
    the pool and turning every later /tts into a permanent 429)."""
    produced = []
    release = threading.Event()

    def slow_stream(text="", **kw):
        for i in range(64):
            produced.append(i)
            yield np.zeros(256, np.float32)
        release.set()

    srv = TTSServer(stub_engine, ServerSettings(max_concurrency=1,
                                                cache_dir="/tmp/ttstest-cache"),
                    stream_fn=slow_stream)

    class DyingWriter:
        def __init__(self):
            self.writes = 0

        def write(self, data):
            pass

        async def drain(self):
            self.writes += 1
            if self.writes >= 2:
                raise ConnectionResetError("client went away")

    async def scenario():
        w = DyingWriter()
        with pytest.raises(ConnectionResetError):
            await srv._tts(w, json.dumps({"text": "x"}).encode(), stream=True)

    asyncio.run(scenario())
    # the producer must have stopped early (nowhere near the 64 chunks) and
    # the pool thread must be free again: a fresh blocking request succeeds
    assert not release.is_set()
    assert len(produced) < 64

    async def follow_up():
        chunks = []

        class Collector:
            def write(self, data):
                chunks.append(bytes(data))

            async def drain(self):
                pass

        await srv._tts(Collector(), json.dumps({"text": "y"}).encode(), stream=False)
        return b"".join(chunks)

    out = asyncio.run(asyncio.wait_for(follow_up(), timeout=10))
    assert b"RIFF" in out


def test_value_error_maps_to_400():
    """Engine ValueError (e.g. use_emo_text without the Qwen model) -> 400."""
    def picky_engine(text="", use_emo_text=False, **kw):
        if use_emo_text:
            raise ValueError("use_emo_text requested but no Qwen emotion model")
        return stub_engine(text)

    srv = TTSServer(picky_engine, ServerSettings(max_concurrency=1,
                                                 cache_dir="/tmp/ttstest-c3"))

    async def scenario():
        chunks = []

        class W:
            def write(self, d):
                chunks.append(bytes(d))

            async def drain(self):
                pass

        await srv._tts(W(), json.dumps({"text": "x", "use_emo_text": True}).encode(),
                       stream=False)
        return b"".join(chunks)

    out = asyncio.run(scenario())
    assert out.startswith(b"HTTP/1.1 400")
    assert b"Qwen" in out


def test_serving_beam_default(monkeypatch):
    """The serving default decode route is the sampling loop (num_beams=1,
    via TARS_NUM_BEAMS — measured ~1.9x cheaper e2e than beam-3; the
    reference's accelerated serving path ignores num_beams too,
    model_v2.py:871-883). The library default stays at the reference HF
    default (3)."""
    from indextts_tpu.config import RuntimeConfig

    monkeypatch.delenv("TARS_NUM_BEAMS", raising=False)
    assert RuntimeConfig.from_env().num_beams == 3
    monkeypatch.setenv("TARS_NUM_BEAMS", "1")
    assert RuntimeConfig.from_env().num_beams == 1


def test_tts_client_blocking_and_stream(server, tmp_path):
    """TTSClient end-to-end against the stub server: /tts writes a WAV,
    /tts/stream writes PCM with a sane TTFB (read1 path: first chunk must
    not wait for the full body)."""
    from indextts_tpu.client import TTSClient

    c = TTSClient("http://127.0.0.1:18321")
    assert c.readyz()

    out = c.tts("client blocking test", out_path=str(tmp_path / "b.wav"))
    data = (tmp_path / "b.wav").read_bytes()
    assert data[:4] == b"RIFF" and out["bytes"] == len(data)

    s = c.tts_stream("client stream test", out_path=str(tmp_path / "s.pcm"))
    # stub stream yields 3 chunks of 1024 f32 zeros -> 3*2048 s16le bytes
    assert s["bytes"] == 3 * 2048
    assert 0 < s["ttfb_s"] <= s["wall_s"]


def test_pick_continuous_slots_auto_and_manual():
    """Serving-mode auto-pick encodes the measured crossover
    (docs/DEPLOYMENT.md decision table): sequential at fan-in <= 3,
    one slot per admitted request (capped 8) from 4 up; explicit
    integers stay manual."""
    from indextts_tpu.serve import pick_continuous_slots as pick

    assert pick({}) == 0                                   # default fan-in 1
    assert pick({"TARS_MAX_CONCURRENCY": "3"}) == 0
    assert pick({"TARS_MAX_CONCURRENCY": "4"}) == 4
    assert pick({"TARS_MAX_CONCURRENCY": "32"}) == 8       # cap
    assert pick({"TARS_CONTINUOUS_SLOTS": "0",
                 "TARS_MAX_CONCURRENCY": "16"}) == 0       # manual override
    assert pick({"TARS_CONTINUOUS_SLOTS": "6"}) == 6
