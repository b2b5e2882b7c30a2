#!/usr/bin/env python
"""Manifest utilities: merge, resume, dedup, verify.

Parity targets: tools/merge_manifests.py, tools/create_resume_jsonl.py,
tools/find_duplicates.py, tools/verify_audio_content.py.
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter
from pathlib import Path


def cmd_merge(args):
    seen = set()
    n = 0
    with open(args.output, "w") as out:
        for path in args.inputs:
            for line in open(path):
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                uid = row.get("id")
                if uid in seen:
                    continue
                seen.add(uid)
                out.write(json.dumps(row, ensure_ascii=False) + "\n")
                n += 1
    print(f"merged {n} unique rows -> {args.output}", file=sys.stderr)


def cmd_resume(args):
    """Emit the rows of the input corpus NOT yet present in the manifest."""
    done = set()
    if Path(args.manifest).exists():
        for line in open(args.manifest):
            try:
                row = json.loads(line)
                if "error" not in row:
                    done.add(str(row.get("id")))
            except json.JSONDecodeError:
                continue
    n = 0
    with open(args.output, "w") as out:
        for i, line in enumerate(open(args.input)):
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if str(row.get("id", i)) in done:
                continue
            out.write(json.dumps(row, ensure_ascii=False) + "\n")
            n += 1
    print(f"{n} remaining tasks -> {args.output}", file=sys.stderr)


def cmd_duplicates(args):
    counts = Counter()
    for line in open(args.manifest):
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        key = row.get("text") if args.by == "text" else row.get("id")
        if key is not None:
            counts[key] += 1
    dups = {k: c for k, c in counts.items() if c > 1}
    print(json.dumps({"duplicates": len(dups), "rows": dups}, ensure_ascii=False))


def cmd_verify(args):
    """Check every manifest wav exists, is readable, non-silent, and matches
    the recorded duration."""
    from indextts_tpu.utils.audio import load_wav

    ok = bad = 0
    problems = []
    for line in open(args.manifest):
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "error" in row:
            bad += 1
            problems.append({"id": row.get("id"), "problem": row["error"]})
            continue
        wav_path = row.get("wav")
        try:
            w, sr = load_wav(wav_path)
        except Exception as e:
            bad += 1
            problems.append({"id": row.get("id"), "problem": f"unreadable: {e}"})
            continue
        dur = len(w) / sr
        if abs(dur - row.get("duration_sec", dur)) > 0.05:
            bad += 1
            problems.append({"id": row.get("id"), "problem": f"duration {dur:.2f} != {row.get('duration_sec')}"})
        elif float(abs(w).max() if len(w) else 0.0) < 1e-5:
            bad += 1
            problems.append({"id": row.get("id"), "problem": "silent"})
        else:
            ok += 1
    print(json.dumps({"ok": ok, "bad": bad, "problems": problems[:50]}))


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("merge")
    m.add_argument("inputs", nargs="+")
    m.add_argument("-o", "--output", required=True)
    m.set_defaults(fn=cmd_merge)

    r = sub.add_parser("resume")
    r.add_argument("--input", required=True)
    r.add_argument("--manifest", required=True)
    r.add_argument("-o", "--output", required=True)
    r.set_defaults(fn=cmd_resume)

    d = sub.add_parser("duplicates")
    d.add_argument("--manifest", required=True)
    d.add_argument("--by", choices=["text", "id"], default="text")
    d.set_defaults(fn=cmd_duplicates)

    v = sub.add_parser("verify")
    v.add_argument("--manifest", required=True)
    v.set_defaults(fn=cmd_verify)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
