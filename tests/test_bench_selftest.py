"""The driver benchmark's control flow, exercised on CPU via BENCH_TINY=1.

Round 4 lost its headline number because bench.py emitted one JSON line only
after every section completed and the driver killed it mid-warmup
(BENCH_r04.json rc=124, parsed null). This pins the fix: the headline line is
parsable as soon as the timed runs finish, every later emit is a superset,
and the budget gate skips optional sections instead of dying inside them.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tmp_path, budget, extra_env=None):
    env = dict(
        os.environ,
        BENCH_TINY="1",
        BENCH_BUDGET_S=str(budget),
        JAX_COMPILE_CACHE=str(tmp_path / "cache"),
        **(extra_env or {}),
    )
    # a fresh interpreter: bench must claim its own (CPU) backend
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    parsed = [json.loads(ln) for ln in lines]
    return parsed, proc.stderr


def test_bench_emits_incremental_supersets(tmp_path):
    parsed, err = run_bench(tmp_path, budget=600)
    assert len(parsed) >= 2, "expected progressive emits"
    head = parsed[0]
    # headline completeness: the driver can parse ANY line, including the
    # first, and always gets the round metric
    for key in ("metric", "value", "unit", "vs_baseline", "rtf",
                "compile_s", "startup_s"):
        assert key in head, key
    assert head["metric"] == "audio_sec_generated_per_wall_sec"
    assert head["value"] > 0
    # every later line is a strict superset of the headline fields
    for line in parsed[1:]:
        for k, v in head.items():
            assert k in line
    last = parsed[-1]
    # with a generous budget every optional section lands
    assert "stages" in last and "seq_tail" in last
    assert last["seq_tail"]["segments"] == 4
    assert last["sections_skipped"] == []


def test_bench_budget_skips_but_headline_survives(tmp_path):
    # warm the compile cache first so the second run's startup fits
    run_bench(tmp_path, budget=600, extra_env={"BENCH_STAGES": "0",
                                               "BENCH_SEQ_TAIL": "0",
                                               "BENCH_BATCHED": "0",
                                               "BENCH_BATCHED_E2E": "0",
                                               "BENCH_BEAM": "0"})
    parsed, err = run_bench(tmp_path, budget=1)  # nothing optional fits
    assert parsed, "headline must be emitted even with a exhausted budget"
    last = parsed[-1]
    assert last["value"] > 0
    assert last["sections_skipped"], "skips must be recorded in the artifact"
    assert "batched_e2e_audio_s" not in last
    # cold/warm startup tracking: second process saw a prewarmed cache and
    # still knows the cold number from the sidecar
    assert last["startup_prewarmed"] is True
    assert last["cold_startup_s"] is not None
