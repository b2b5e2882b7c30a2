"""Checkpoint loader: torch formats -> flax conversion + Orbax native cache
round trip."""

from pathlib import Path

import numpy as np
import pytest


def test_orbax_roundtrip(tmp_path):
    from indextts_tpu.runtime.loader import _orbax_restore, _orbax_save

    tree = {
        "gpt": {"layer": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)}},
        "scale": np.asarray([1.5], np.float32),
    }
    _orbax_save(tmp_path / "params", tree)
    back = _orbax_restore(tmp_path / "params")
    np.testing.assert_array_equal(back["gpt"]["layer"]["kernel"], tree["gpt"]["layer"]["kernel"])
    np.testing.assert_array_equal(back["scale"], tree["scale"])


def test_convert_reference_checkpoints_gpt(tmp_path):
    """A gpt.pth in the reference layout converts through the loader path."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from reference_compat import import_reference

    from indextts_tpu.config import (
        ConditionModuleConfig,
        GPTConfig,
        IndexTTS2Config,
    )
    from indextts_tpu.runtime.loader import convert_reference_checkpoints

    mv2 = import_reference("indextts.gpt.model_v2")
    torch.manual_seed(1)
    ref = mv2.UnifiedVoice(
        layers=1, model_dim=64, heads=4, max_text_tokens=16, max_mel_tokens=24,
        number_text_tokens=40, number_mel_codes=20, start_mel_token=18,
        stop_mel_token=19, condition_type="conformer_perceiver",
        condition_module=dict(output_size=32, linear_units=32, attention_heads=4,
                              num_blocks=1, input_layer="conv2d2", perceiver_mult=2),
        emo_condition_module=dict(output_size=32, linear_units=32, attention_heads=2,
                                  num_blocks=1, input_layer="conv2d2", perceiver_mult=2),
    )
    torch.save(ref.state_dict(), tmp_path / "gpt.pth")

    cfg = IndexTTS2Config(
        gpt=GPTConfig(
            model_dim=64, layers=1, heads=4, max_mel_tokens=24, max_text_tokens=16,
            number_text_tokens=40, number_mel_codes=20, start_mel_token=18,
            stop_mel_token=19,
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=32, attention_heads=4, num_blocks=1
            ),
            emo_condition_module=ConditionModuleConfig(
                output_size=32, linear_units=32, attention_heads=2, num_blocks=1
            ),
        )
    )
    params, aux = convert_reference_checkpoints(str(tmp_path), cfg)
    assert "gpt" in params
    k = params["gpt"]["gpt"]["h_0"]["attn"]["c_attn"]["kernel"]
    np.testing.assert_array_equal(
        k, ref.state_dict()["gpt.h.0.attn.c_attn.weight"].numpy()
    )
