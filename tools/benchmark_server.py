#!/usr/bin/env python
"""HTTP server benchmark: TTFB + total-time stats for blocking vs streaming
endpoints (reference: tests/benchmark_server.py, aiohttp-based)."""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import sys
import time


async def bench_blocking(session, url, payload, n):
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        async with session.post(f"{url}/tts", json=dict(payload, seed=i)) as r:
            await r.read()
            assert r.status == 200, r.status
        times.append(time.perf_counter() - t0)
    return times


async def bench_streaming(session, url, payload, n):
    ttfb, total = [], []
    for i in range(n):
        t0 = time.perf_counter()
        first = None
        async with session.post(f"{url}/tts/stream", json=dict(payload, seed=i)) as r:
            assert r.status == 200, r.status
            async for _ in r.content.iter_chunked(4096):
                if first is None:
                    first = time.perf_counter() - t0
        ttfb.append(first or 0.0)
        total.append(time.perf_counter() - t0)
    return ttfb, total


def stats(xs):
    return {
        "mean": round(statistics.mean(xs), 3),
        "min": round(min(xs), 3),
        "max": round(max(xs), 3),
        "p50": round(statistics.median(xs), 3),
    }


async def run(args):
    import aiohttp

    payload = {"text": args.text}
    if args.spk_audio:
        payload["spk_audio"] = args.spk_audio
    async with aiohttp.ClientSession() as session:
        out = {}
        blocking = await bench_blocking(session, args.url, payload, args.n)
        out["blocking_total_s"] = stats(blocking)
        if not args.no_streaming:
            ttfb, total = await bench_streaming(session, args.url, payload, args.n)
            out["stream_ttfb_s"] = stats(ttfb)
            out["stream_total_s"] = stats(total)
        print(json.dumps(out, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--text", default="The quick brown fox jumps over the lazy dog.")
    p.add_argument("--spk-audio", default=None)
    p.add_argument("-n", type=int, default=5)
    p.add_argument("--no-streaming", action="store_true")
    args = p.parse_args(argv)
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
