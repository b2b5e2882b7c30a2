#!/usr/bin/env python
"""Generate per-clip JSON transcripts from a source-text JSONL + manifest.

Parity target: tools/generate_transcripts.py (theirs hardcodes personal
paths; this one is argument-driven). For every WAV in --audio-dir, looks up
its ground-truth text in --source-jsonl (by id == wav stem) and its duration
in --manifest, then writes <stem>.json next to the wav:

  {"audio_path": "...", "segments": [{"start": 0.0, "end": d, "text": ...,
                                      "speaker": "assistant"}]}

  python tools/generate_transcripts.py --source-jsonl src.jsonl \
      --manifest dataset.jsonl --audio-dir data_stereo/ [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load_jsonl(path: Path) -> list:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="generate_transcripts")
    p.add_argument("--source-jsonl", required=True,
                   help="JSONL with {'id': ..., 'text': ...} ground truth")
    p.add_argument("--manifest", required=True,
                   help="dataset manifest JSONL with {'path', 'duration'}")
    p.add_argument("--audio-dir", required=True)
    p.add_argument("--out-dir", default=None,
                   help="defaults to --audio-dir")
    p.add_argument("--speaker", default="assistant")
    p.add_argument("--default-duration", type=float, default=5.0)
    args = p.parse_args(argv)

    audio_dir = Path(args.audio_dir)
    out_dir = Path(args.out_dir) if args.out_dir else audio_dir
    out_dir.mkdir(parents=True, exist_ok=True)

    durations = {}
    for entry in load_jsonl(Path(args.manifest)):
        if "path" in entry:
            durations[Path(entry["path"]).stem] = entry.get("duration")

    source = {e["id"]: e for e in load_jsonl(Path(args.source_jsonl)) if "id" in e}

    written = missing = 0
    for wav in sorted(audio_dir.glob("*.wav")):
        sid = wav.stem
        if sid not in source:
            print(f"warning: no source text for {sid}", file=sys.stderr)
            missing += 1
            continue
        duration = durations.get(sid) or args.default_duration
        transcript = {
            "audio_path": wav.name,
            "segments": [
                {
                    "start": 0.0,
                    "end": float(duration),
                    "text": source[sid].get("text", ""),
                    "speaker": args.speaker,
                }
            ],
        }
        with open(out_dir / f"{sid}.json", "w") as f:
            json.dump(transcript, f, ensure_ascii=False, indent=2)
        written += 1
    print(f"wrote {written} transcripts ({missing} missing source text)")
    return 0 if written else 1


if __name__ == "__main__":
    sys.exit(main())
