#!/usr/bin/env python
"""Standalone live-server smoke test (reference: run_server_test.py /
tests/test_server.py): health, blocking WAV, streaming PCM."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--text", default="Server smoke test, one two three.")
    p.add_argument("--spk-audio", default=None)
    args = p.parse_args(argv)

    from indextts_tpu.client import TTSClient

    c = TTSClient(args.url)
    ok = True
    print(f"healthz: {'ok' if c.healthz() else 'FAIL'}")
    print(f"readyz:  {'ok' if c.readyz() else 'FAIL'}")
    ok = c.healthz() and c.readyz()
    kw = {"spk_audio": args.spk_audio} if args.spk_audio else {}
    try:
        r = c.tts(args.text, "server_test.wav", **kw)
        with open("server_test.wav", "rb") as f:
            assert f.read(4) == b"RIFF"
        print(f"/tts: ok ({r['bytes']} bytes, {r['wall_s']}s)")
    except Exception as e:
        print(f"/tts: FAIL ({e})")
        ok = False
    try:
        r = c.tts_stream(args.text, "server_test.pcm", **kw)
        print(f"/tts/stream: ok ({r['bytes']} bytes, ttfb {r['ttfb_s']}s)")
    except Exception as e:
        print(f"/tts/stream: FAIL ({e})")
        ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
