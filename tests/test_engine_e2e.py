"""End-to-end smoke test: the full 5-model cascade with random weights on a
tiny config — conditioning -> AR decode -> latent -> CFM -> vocoder."""

import dataclasses

import numpy as np
import pytest

from indextts_tpu.config import (
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
from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params


def tiny_config() -> IndexTTS2Config:
    return IndexTTS2Config(
        gpt=GPTConfig(
            model_dim=64,
            layers=2,
            heads=4,
            max_mel_tokens=64,
            max_text_tokens=32,
            number_text_tokens=50,
            number_mel_codes=36,
            start_mel_token=34,
            stop_mel_token=35,
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=48, attention_heads=4, num_blocks=1
            ),
            emo_condition_module=ConditionModuleConfig(
                output_size=32, linear_units=32, attention_heads=2, num_blocks=1
            ),
        ),
        semantic_codec=SemanticCodecConfig(
            codebook_size=36, hidden_size=1024, codebook_dim=8, vocos_dim=24,
            vocos_intermediate_dim=32, vocos_num_layers=1,
        ),
        s2mel=S2MelConfig(
            length_regulator=LengthRegulatorConfig(channels=32, in_channels=1024),
            dit=DiTConfig(hidden_dim=32, num_heads=4, depth=3, in_channels=80,
                          content_dim=32, style_dim=192),
            wavenet=WaveNetConfig(hidden_dim=32, num_layers=2, kernel_size=5),
            gpt_dims=(64, 16, 8, 1024),
        ),
        vocoder=BigVGANConfig(
            num_mels=80,
            upsample_rates=(8, 8, 4),
            upsample_kernel_sizes=(16, 16, 8),
            upsample_initial_channel=16,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        ),
        w2vbert=W2VBertConfig(
            hidden_size=1024, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, tap_layer=2, conv_depthwise_kernel_size=7,
        ),
        campplus=CampPlusConfig(),
        runtime=RuntimeConfig(diffusion_steps=2, max_mel_tokens=24),
    )


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_config()
    params = random_params(cfg, seed=0)
    return IndexTTS2Engine(cfg, params)


def test_e2e_synthesis(engine, rng):
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    text = rng.integers(2, 50, 7)
    out = engine.infer((prompt, sr), [text], seed=0)
    assert out["sampling_rate"] == 22050
    wav = out["audio"]
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()
    # vocoder upsample factor of the tiny config is 256 as well
    assert len(wav) % 256 == 0


def test_e2e_two_segments_with_silence(engine, rng):
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 6)]
    out = engine.infer((prompt, sr), segs, seed=1, interval_silence=100)
    assert len(out["stats"]) == 2
    assert out["duration_sec"] > 0


def test_e2e_emotion_vector(engine, rng):
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    vec = engine.normalize_emo_vec([0, 0, 1.0, 0, 0, 0, 0, 0])
    out = engine.infer((prompt, sr), [rng.integers(2, 50, 4)], emo_vector=vec, seed=2)
    assert np.isfinite(out["audio"]).all()


def test_e2e_batched_segments(engine, rng):
    """batched=True runs all segments through one AR loop and produces
    per-segment audio of the expected lengths."""
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 8), rng.integers(2, 50, 3)]
    out = engine.infer((prompt, sr), segs, seed=3, batched=True)
    assert out["duration_sec"] > 0
    assert np.isfinite(out["audio"]).all()
