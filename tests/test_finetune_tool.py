"""Fine-tune driver (tools/finetune.py): sharded steps on the virtual
mesh, Orbax save, and resume continuity — the training story the
inference-only reference never had (SURVEY §5 checkpoint/resume)."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).parent))

import finetune  # noqa: E402

from test_engine_e2e import tiny_config  # noqa: E402


@pytest.fixture
def patched_cfg(monkeypatch):
    import indextts_tpu.config as config_mod

    monkeypatch.setattr(config_mod, "load_config", lambda *a, **k: tiny_config())


def test_gpt_finetune_save_and_resume(patched_cfg, tmp_path):
    out = finetune.main([
        "--target", "gpt", "--synthetic", "4", "--steps", "4",
        "--out-dir", str(tmp_path / "ft"), "--save-every", "2",
        "--log-every", "2", "--model-parallel", "2",
    ])
    assert out["final_step"] == 4
    assert out["mesh"] == {"data": 4, "model": 2}
    assert out["loss_last"] is not None
    meta = json.loads((tmp_path / "ft" / "latest" / "meta.json").read_text())
    assert meta["step"] == 4
    assert (tmp_path / "ft" / "latest" / "params").exists()
    assert (tmp_path / "ft" / "latest" / "opt_state").exists()

    # resume continues the step counter and keeps training
    out2 = finetune.main([
        "--target", "gpt", "--synthetic", "4", "--steps", "3",
        "--out-dir", str(tmp_path / "ft"), "--save-every", "100",
        "--log-every", "1", "--model-parallel", "2",
    ])
    assert out2["from_step"] == 4
    assert out2["final_step"] == 7
    meta = json.loads((tmp_path / "ft" / "latest" / "meta.json").read_text())
    assert meta["step"] == 7


def test_cfm_finetune_smoke(patched_cfg, tmp_path):
    out = finetune.main([
        "--target", "cfm", "--synthetic", "4", "--steps", "2",
        "--log-every", "1", "--model-parallel", "2",
    ])
    assert out["final_step"] == 2
    assert out["loss_last"] is not None and out["loss_last"] > 0
