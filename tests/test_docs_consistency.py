"""Docs/artifact consistency guards (VERDICT r4 weak #5/#6/#7: recurring
off-by-N doc rot and artifacts that read as current after being superseded).
These turn the consistency sweep into failing tests instead of a manual
checklist."""

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_readme_test_count_matches_collection():
    """README's 'N tests green' claim must equal the live collected count
    (three rounds of off-by-N rot; now it fails the suite instead)."""
    readme = (REPO / "README.md").read_text()
    m = re.search(r"(\d+)\s+tests green", readme)
    assert m, "README no longer states the test count"
    claimed = int(m.group(1))
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    cm = re.search(r"(\d+) tests collected", out.stdout)
    assert cm, f"could not parse collection count:\n{out.stdout[-500:]}"
    collected = int(cm.group(1))
    assert claimed == collected, (
        f"README claims {claimed} tests, suite collects {collected} — "
        "update README.md"
    )


def test_bench_server_r04_carries_superseded_note():
    """The r4 continuous-mode rows predate the tail offload that fixed
    them; the JSON itself must say so (the explanation living only in
    ARCHITECTURE.md let the artifact read as current)."""
    d = json.loads((REPO / "BENCH_SERVER_r04.json").read_text())
    note = d["continuous"].get("superseded_by", "")
    assert "BENCH_TAIL_r04.json" in note


def test_soak_r04_states_rss_only_gate():
    """SOAK's HBM gauge ran 'unavailable' on this backend: the artifact
    must state the leak gate is RSS-only rather than implying a device
    gate passed."""
    d = json.loads((REPO / "SOAK_r04.json").read_text())
    assert "RSS only" in d["summary"].get("hbm_gauge_note", "")
