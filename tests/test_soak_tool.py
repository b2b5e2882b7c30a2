"""Soak-test tool (tools/soak_server.py) against a stub server: wave
mechanics, leak/drift detection, exit codes."""

import asyncio
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

import soak_server  # noqa: E402

from indextts_tpu.runtime.server import ServerSettings, TTSServer  # noqa: E402


def _stub_server(port, tmpdir, delay=0.02):
    def engine(text="", **kw):
        time.sleep(delay)
        return {"audio": np.zeros(1024, np.float32), "sampling_rate": 22050}

    srv = TTSServer(engine, ServerSettings(
        host="127.0.0.1", port=port, max_concurrency=4, cache_dir=tmpdir,
    ))
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.serve())

    threading.Thread(target=run, daemon=True).start()
    while not srv.ready:
        time.sleep(0.02)
    return srv, loop


def test_soak_passes_on_stable_stub(tmp_path, monkeypatch):
    port = 18771
    _stub_server(port, str(tmp_path / "cache"))

    def fake_serve_main(argv):
        time.sleep(3600)  # the stub is already serving on the port

    import indextts_tpu.serve as serve_mod

    monkeypatch.setattr(serve_mod, "main", fake_serve_main)
    out = tmp_path / "soak.json"
    rc = soak_server.main([
        "--requests", "12", "--clients", "2", "--waves", "3",
        "--port", str(port), "--output", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["summary"]["ok"] is True
    assert len(report["waves"]) == 3
    assert all(w["n"] > 0 and w["p50_s"] > 0 for w in report["waves"])


def test_soak_fails_on_latency_drift(tmp_path, monkeypatch):
    """A server whose latency degrades over time must fail the drift gate."""
    port = 18772
    state = {"calls": 0}

    def engine(text="", **kw):
        state["calls"] += 1
        time.sleep(0.01 * state["calls"])  # monotonically slower
        return {"audio": np.zeros(1024, np.float32), "sampling_rate": 22050}

    srv = TTSServer(engine, ServerSettings(
        host="127.0.0.1", port=port, max_concurrency=4,
        cache_dir=str(tmp_path / "cache2"),
    ))
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.serve())

    threading.Thread(target=run, daemon=True).start()
    while not srv.ready:
        time.sleep(0.02)

    import indextts_tpu.serve as serve_mod

    monkeypatch.setattr(serve_mod, "main", lambda argv: time.sleep(3600))
    rc = soak_server.main([
        "--requests", "12", "--clients", "2", "--waves", "3",
        "--port", str(port), "--max-latency-drift", "1.2",
    ])
    assert rc == 1


def test_hbm_gauge_live_arrays_fallback():
    """VERDICT r4 stretch #9: on backends with no allocator memory_stats
    (axon TPU, CPU) the gauge falls back to summing live jax.Arrays, so the
    soak's device-leak gate measures real growth instead of reporting
    'unavailable'."""
    import jax.numpy as jnp

    from indextts_tpu.utils.obs import get_hbm_usage

    u0 = get_hbm_usage()
    assert u0.get("source") in ("memory_stats", "live_arrays")
    big = jnp.ones((512, 512, 8), jnp.float32)  # 8 MB held
    u1 = get_hbm_usage()
    if u0["source"] == "live_arrays":
        grown = u1["gb_in_use"] - u0["gb_in_use"]
        assert grown >= 8e6 / 1e9 * 0.9, (u0, u1)
    del big
