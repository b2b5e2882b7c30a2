"""v1 engine e2e smoke: bucketed batched decode -> latents -> v1 vocoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.config import ConditionModuleConfig, GPTConfig, MelConfig
from indextts_tpu.models.bigvgan_v1 import BigVGANv1, BigVGANv1Config
from indextts_tpu.models.unified_voice_v1 import UnifiedVoiceV1
from indextts_tpu.runtime.engine_v1 import IndexTTSV1Engine, bucket_segments


GPT_TINY = GPTConfig(
    model_dim=64, layers=2, heads=4, max_mel_tokens=64, max_text_tokens=32,
    number_text_tokens=50, number_mel_codes=36, start_mel_token=34,
    stop_mel_token=35, mel_length_compression=1024,
    condition_module=ConditionModuleConfig(
        output_size=32, linear_units=48, attention_heads=4, num_blocks=1,
        input_size=100,
    ),
)
VOC_TINY = BigVGANv1Config(
    gpt_dim=64, num_mels=100,
    upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
    upsample_initial_channel=16, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), speaker_embedding_dim=16,
    ecapa_channels=(16, 16, 16, 16, 48), ecapa_attention_channels=8,
    ecapa_se_channels=8, feat_upsample=True,
)


def test_bucket_segments():
    assert bucket_segments([5, 9, 3, 7, 2], 2) == [[4, 2], [0, 3], [1]]


@pytest.fixture(scope="module")
def engine():
    k = jax.random.PRNGKey(0)
    gpt = UnifiedVoiceV1(GPT_TINY)
    p_gpt = gpt.init(
        k,
        jnp.zeros((1, 10, 100)), jnp.asarray([10]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6 * 1024]),
        method=UnifiedVoiceV1.forward_latent,
    )["params"]
    p_head = gpt.init(k, jnp.zeros((1, 64)), method=UnifiedVoiceV1.mel_logits_from_hidden)["params"]
    for k2, v in p_head.items():
        p_gpt.setdefault(k2, v)
    voc = BigVGANv1(VOC_TINY)
    p_voc = voc.init(k, jnp.zeros((1, 4, 64)), jnp.zeros((1, 30, 100)))["params"]
    # positive BN stats
    def fix(t):
        return jax.tree_util.tree_map(lambda x: jnp.abs(x) + 0.01, t)
    return IndexTTSV1Engine(
        GPT_TINY, VOC_TINY, {"gpt": p_gpt, "bigvgan": fix(p_voc)},
    )


def test_v1_engine_e2e(engine, rng):
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 7), rng.integers(2, 50, 4)]
    out = engine.infer_fast((prompt, sr), segs, max_mel_tokens=12, seed=0)
    assert out["sampling_rate"] == 24000
    assert np.isfinite(out["audio"]).all()
    assert out["duration_sec"] > 0


def test_v1_engine_quantized(rng):
    """v1 engine with the shared decode-runtime quantization knobs
    (W8A8 + int8 KV + int8 head): finite audio, codes in vocab."""
    k = jax.random.PRNGKey(0)
    gpt = UnifiedVoiceV1(GPT_TINY)
    p_gpt = gpt.init(
        k,
        jnp.zeros((1, 10, 100)), jnp.asarray([10]),
        jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6 * 1024]),
        method=UnifiedVoiceV1.forward_latent,
    )["params"]
    p_head = gpt.init(
        k, jnp.zeros((1, 64)), method=UnifiedVoiceV1.mel_logits_from_hidden
    )["params"]
    for k2, v in p_head.items():
        p_gpt.setdefault(k2, v)
    voc = BigVGANv1(VOC_TINY)
    p_voc = voc.init(k, jnp.zeros((1, 4, 64)), jnp.zeros((1, 30, 100)))["params"]
    p_voc = jax.tree_util.tree_map(lambda x: jnp.abs(x) + 0.01, p_voc)
    eng = IndexTTSV1Engine(
        GPT_TINY, VOC_TINY, {"gpt": p_gpt, "bigvgan": p_voc},
        quantize_gpt=True, kv_quant=True, head_quant=True,
    )
    assert eng.p_gpt["mel_head"]["kernel_q"].shape == (64, 128)
    sr = 24000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 7)]
    out = eng.infer_fast((prompt, sr), segs, max_mel_tokens=12, seed=0)
    assert np.isfinite(out["audio"]).all() and out["audio"].size > 0
