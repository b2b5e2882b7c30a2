"""Dataset-builder pipeline tests with mock inference (mirrors reference
tests/test_refactored_components.py coverage: no models loaded)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

import build_dataset  # noqa: E402
import manifest_utils  # noqa: E402


@pytest.fixture
def corpus(tmp_path):
    rows = [{"id": f"u{i}", "text": f"hello world number {i}"} for i in range(6)]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return p, rows


def test_mock_synthesize_deterministic():
    a = build_dataset.mock_synthesize("same text")
    b = build_dataset.mock_synthesize("same text")
    np.testing.assert_array_equal(a, b)
    c = build_dataset.mock_synthesize("different")
    assert len(a) != len(c) or not np.array_equal(a, c)


def test_thread_backend_mock(tmp_path, corpus):
    path, rows = corpus
    out = tmp_path / "out"
    build_dataset.main([
        "--input", str(path), "--out-dir", str(out),
        "--workers", "3", "--mock-inference",
    ])
    manifest = [json.loads(l) for l in open(out / "manifest.jsonl")]
    assert len(manifest) == 6
    assert all("error" not in m for m in manifest)
    assert all((out / "wavs" / f"{m['id']}.wav").exists() for m in manifest)


def test_resume_skips_completed(tmp_path, corpus):
    path, rows = corpus
    out = tmp_path / "out"
    build_dataset.main([
        "--input", str(path), "--out-dir", str(out), "--mock-inference",
    ])
    first = len(open(out / "manifest.jsonl").readlines())
    # run again: all skipped, manifest unchanged
    build_dataset.main([
        "--input", str(path), "--out-dir", str(out), "--mock-inference",
    ])
    second = len(open(out / "manifest.jsonl").readlines())
    assert first == second == 6


def test_process_backend_mock(tmp_path, corpus):
    path, rows = corpus
    out = tmp_path / "out_proc"
    build_dataset.main([
        "--input", str(path), "--out-dir", str(out),
        "--workers", "2", "--backend", "process", "--mock-inference",
    ])
    manifest = [json.loads(l) for l in open(out / "manifest.jsonl")]
    assert len(manifest) == 6
    assert {m["id"] for m in manifest} == {f"u{i}" for i in range(6)}


def test_manifest_merge_dedup_verify(tmp_path, corpus, capsys):
    path, rows = corpus
    out = tmp_path / "out"
    build_dataset.main([
        "--input", str(path), "--out-dir", str(out), "--mock-inference",
    ])
    m1 = out / "manifest.jsonl"
    merged = tmp_path / "merged.jsonl"
    manifest_utils.main(["merge", str(m1), str(m1), "-o", str(merged)])
    assert len(open(merged).readlines()) == 6

    manifest_utils.main(["duplicates", "--manifest", str(merged)])
    dup_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dup_out["duplicates"] == 0

    manifest_utils.main(["verify", "--manifest", str(merged)])
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["ok"] == 6 and v["bad"] == 0


def test_resume_tool(tmp_path, corpus):
    path, rows = corpus
    manifest = tmp_path / "m.jsonl"
    manifest.write_text(json.dumps({"id": "u0"}) + "\n" + json.dumps({"id": "u3"}) + "\n")
    remaining = tmp_path / "rem.jsonl"
    manifest_utils.main([
        "resume", "--input", str(path), "--manifest", str(manifest),
        "-o", str(remaining),
    ])
    rem = [json.loads(l)["id"] for l in open(remaining)]
    assert rem == ["u1", "u2", "u4", "u5"]
