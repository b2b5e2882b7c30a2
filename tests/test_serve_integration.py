"""serve.py integration: the real entrypoint wired end-to-end on the tiny
config — auto-picked continuous batching (TARS_MAX_CONCURRENCY>=4), the
precompile-before-warmup ordering, and both HTTP routes. The server benches
exercise this composition on TPU; this keeps it covered in the suite."""

import http.client
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from test_engine_e2e import tiny_config  # noqa: E402


@pytest.fixture()
def serve_env(tmp_path, monkeypatch):
    from indextts_tpu.utils.audio import save_wav

    rng = np.random.default_rng(21)
    prompt = tmp_path / "ref.wav"
    save_wav(str(prompt), (rng.standard_normal(16000) * 0.1).astype(np.float32),
             16000)
    monkeypatch.setenv("TARS_REFERENCE_AUDIO", str(prompt))
    monkeypatch.setenv("TARS_WARMUP", "0")          # keep the test fast
    monkeypatch.setenv("TARS_PRECOMPILE", "0")
    monkeypatch.setenv("TARS_CACHE_DIR", str(tmp_path / "cache"))
    import indextts_tpu.config as config_mod

    monkeypatch.setattr(config_mod, "load_config",
                        lambda *a, **k: tiny_config())
    return prompt


def _boot(port, extra_env, monkeypatch):
    for k, v in extra_env.items():
        monkeypatch.setenv(k, v)
    import indextts_tpu.serve as serve_mod

    th = threading.Thread(
        target=lambda: serve_mod.main(["--port", str(port)]), daemon=True
    )
    th.start()
    deadline = time.time() + 240
    while time.time() < deadline:
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            c.request("GET", "/readyz")
            if c.getresponse().status == 200:
                return
        except Exception:
            time.sleep(0.5)
    raise AssertionError("server never became ready")


def _post(port, path, payload, timeout=180):
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    c.request("POST", path, body=json.dumps(payload).encode(),
              headers={"Content-Type": "application/json"})
    r = c.getresponse()
    return r.status, r.read()


def test_serve_auto_continuous_end_to_end(serve_env, monkeypatch):
    """TARS_MAX_CONCURRENCY=4 auto-picks continuous batching; blocking and
    streaming requests round-trip through the shared AR loop + tail pool."""
    port = 18985
    _boot(port, {"TARS_MAX_CONCURRENCY": "4"}, monkeypatch)

    status, wav = _post(port, "/tts", {"text": "hello continuous", "seed": 1})
    assert status == 200 and len(wav) > 44, (status, wav[:300])

    status, pcm = _post(port, "/tts/stream",
                        {"text": "stream me. more text.", "seed": 2})
    assert status == 200 and len(pcm) > 0

    # concurrent fan-in: 4 clients at once, all 200
    results = []
    lock = threading.Lock()

    def client(i):
        s, body = _post(port, "/tts", {"text": f"fan in {i}", "seed": 10 + i})
        with lock:
            results.append((s, len(body)))

    ths = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in ths:
        t.start()
    for t in ths:
        t.join(timeout=240)
    assert len(results) == 4 and all(s == 200 for s, _ in results)
