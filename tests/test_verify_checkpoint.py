"""Checkpoint self-test tool (tools/verify_checkpoint.py): structural
validation of a converted checkpoint dir against the config schema, the
feat1/feat2 emotion-matrix layout assumption (infer_v2.py:281-289), and the
problem-detection exit code."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).parent))

import verify_checkpoint  # noqa: E402

from indextts_tpu.config import (  # noqa: E402
    BigVGANConfig,
    CampPlusConfig,
    ConditionModuleConfig,
    DiTConfig,
    GPTConfig,
    IndexTTS2Config,
    LengthRegulatorConfig,
    RuntimeConfig,
    S2MelConfig,
    SemanticCodecConfig,
    W2VBertConfig,
    WaveNetConfig,
)


def tiny_cfg():
    return IndexTTS2Config(
        gpt=GPTConfig(
            model_dim=64, layers=1, heads=4, max_mel_tokens=24,
            max_text_tokens=16, number_text_tokens=40, number_mel_codes=20,
            start_mel_token=18, stop_mel_token=19,
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=32, attention_heads=4, num_blocks=1
            ),
            emo_condition_module=ConditionModuleConfig(
                output_size=32, linear_units=32, attention_heads=2, num_blocks=1
            ),
        ),
        semantic_codec=SemanticCodecConfig(
            codebook_size=20, hidden_size=1024, codebook_dim=8, vocos_dim=24,
            vocos_intermediate_dim=32, vocos_num_layers=1,
        ),
        s2mel=S2MelConfig(
            length_regulator=LengthRegulatorConfig(channels=32, in_channels=1024),
            dit=DiTConfig(hidden_dim=32, num_heads=4, depth=1, in_channels=80,
                          content_dim=32, style_dim=192),
            wavenet=WaveNetConfig(hidden_dim=32, num_layers=1, kernel_size=5),
            gpt_dims=(64, 16, 8, 1024),
        ),
        vocoder=BigVGANConfig(
            num_mels=80, upsample_rates=(8, 8, 4),
            upsample_kernel_sizes=(16, 16, 8), upsample_initial_channel=16,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        ),
        w2vbert=W2VBertConfig(
            hidden_size=1024, num_hidden_layers=1, num_attention_heads=4,
            intermediate_size=64, tap_layer=1, conv_depthwise_kernel_size=7,
        ),
        campplus=CampPlusConfig(),
        runtime=RuntimeConfig(diffusion_steps=2, max_mel_tokens=16),
    )


@pytest.fixture
def ckpt_dir(tmp_path):
    torch = pytest.importorskip("torch")
    from reference_compat import import_reference

    mv2 = import_reference("indextts.gpt.model_v2")
    torch.manual_seed(1)
    ref = mv2.UnifiedVoice(
        layers=1, model_dim=64, heads=4, max_text_tokens=16, max_mel_tokens=24,
        number_text_tokens=40, number_mel_codes=20, start_mel_token=18,
        stop_mel_token=19, condition_type="conformer_perceiver",
        condition_module=dict(output_size=32, linear_units=32, attention_heads=4,
                              num_blocks=1, input_layer="conv2d2",
                              perceiver_mult=2),
        emo_condition_module=dict(output_size=32, linear_units=32,
                                  attention_heads=2, num_blocks=1,
                                  input_layer="conv2d2", perceiver_mult=2),
    )
    torch.save(ref.state_dict(), tmp_path / "gpt.pth")
    cfg = tiny_cfg()
    n = sum(cfg.emo_num)
    torch.save(torch.randn(n, cfg.gpt.model_dim), tmp_path / "feat2.pt")
    torch.save(torch.randn(n, 192), tmp_path / "feat1.pt")
    torch.save(
        {"mean": torch.zeros(1024), "std": torch.ones(1024)},
        tmp_path / "wav2vec2bert_stats.pt",
    )
    return tmp_path


def _patched(monkeypatch):
    import indextts_tpu.config as config_mod

    monkeypatch.setattr(config_mod, "load_config", lambda *a, **k: tiny_cfg())


def test_valid_checkpoint_reports_ok(ckpt_dir, tmp_path, monkeypatch):
    _patched(monkeypatch)
    out = tmp_path / "report.json"
    rc = verify_checkpoint.main(
        ["--model-dir", str(ckpt_dir), "--output", str(out)]
    )
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["components"]["gpt"]["status"] == "ok"
    assert report["components"]["emo_matrix"]["status"] == "ok"
    assert report["components"]["spk_matrix"]["status"] == "ok"
    assert report["components"]["semantic_stats"]["status"] == "ok"
    # absent components are warnings, not errors, without --strict
    assert report["components"]["bigvgan"]["status"] == "not in checkpoint dir"
    assert report["files"]["s2mel.pth"] == "MISSING"


def test_bad_emo_matrix_rows_fail(ckpt_dir, monkeypatch):
    torch = pytest.importorskip("torch")
    _patched(monkeypatch)
    torch.save(torch.randn(7, 64), ckpt_dir / "feat2.pt")  # wrong row count
    rc = verify_checkpoint.main(["--model-dir", str(ckpt_dir)])
    assert rc == 1


def test_strict_flags_missing_files(ckpt_dir, monkeypatch):
    _patched(monkeypatch)
    rc = verify_checkpoint.main(["--model-dir", str(ckpt_dir), "--strict"])
    assert rc == 1
