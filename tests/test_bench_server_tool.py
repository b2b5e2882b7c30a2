"""bench_server_concurrent tool tests against a stub TTSServer: the
multi-segment request construction, the dual-endpoint client worker, and
the streaming-TTFB-vs-blocking-total separation the serving benchmark
publishes (reference analog: tests/benchmark_server.py:10-45 measured
blocking vs streaming separately)."""

import asyncio
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

import bench_server_concurrent as bsc  # noqa: E402

from indextts_tpu.runtime.server import ServerSettings, TTSServer  # noqa: E402

PORT = 18733
SEG_DELAY = 0.15


def stub_engine(text="", **kw):
    # blocking path: all segments synthesized before the response
    n_seg = max(1, len(text) // 110)
    time.sleep(SEG_DELAY * n_seg)
    return {"audio": np.zeros(2205, np.float32), "sampling_rate": 22050}


def stub_stream(text="", **kw):
    # streaming path: one chunk per ~110-char segment, yielded as each
    # segment finishes — first chunk after ONE segment delay
    n_seg = max(1, len(text) // 110)
    for _ in range(n_seg):
        time.sleep(SEG_DELAY)
        yield np.zeros(2205, np.float32)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    settings = ServerSettings(
        host="127.0.0.1", port=PORT, max_concurrency=4,
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
    assert srv.ready
    yield srv
    loop.call_soon_threadsafe(loop.stop)


TEXTS = ["the quick brown fox jumps over the lazy dog again and again " * 4]


def test_multisegment_text_construction(server):
    """segments=4 builds a request whose text tiles to 4 segment caps."""
    results = []
    bsc.client_worker(PORT, 0, 1, results, TEXTS, False,
                      endpoint="/tts/stream", segments=4)
    assert len(results) == 1
    r = results[0]
    # 4 chunks of 2205 samples each came back
    assert r["audio_s"] == pytest.approx(4 * 2205 / 22050.0, rel=0.01)


def test_stream_ttfb_separates_from_total(server):
    """With 4 segments, streaming TTFB must be well under the blocking
    total (the driver criterion: stream TTFB p50 <= 0.5x blocking total
    p50) — the first chunk arrives after ~1 segment, the blocking response
    after all 4."""
    stream_res, block_res = [], []
    bsc.client_worker(PORT, 0, 2, stream_res, TEXTS, False,
                      endpoint="/tts/stream", segments=4)
    bsc.client_worker(PORT, 0, 2, block_res, TEXTS, False,
                      endpoint="/tts", segments=4, seed_base=500000)
    stream_ttfb = bsc.pct([r["ttfb"] for r in stream_res], 50)
    blocking_total = bsc.pct([r["total"] for r in block_res], 50)
    assert stream_ttfb <= 0.5 * blocking_total, (stream_ttfb, blocking_total)
    # and streaming total is NOT shorter than its own TTFB by construction
    assert all(r["total"] >= r["ttfb"] for r in stream_res)


def test_seed_base_dodges_response_cache(server):
    """The blocking pass must not be served from the sha256 response cache
    populated by an identical earlier payload: seed_base shifts the seed."""
    first, second = [], []
    bsc.client_worker(PORT, 7, 1, first, TEXTS, False,
                      endpoint="/tts", segments=2)
    t0 = time.perf_counter()
    bsc.client_worker(PORT, 7, 1, second, TEXTS, False,
                      endpoint="/tts", segments=2, seed_base=500000)
    fresh = time.perf_counter() - t0
    # a cache hit returns in ~ms; a fresh synth pays the stub delay
    assert fresh >= SEG_DELAY
