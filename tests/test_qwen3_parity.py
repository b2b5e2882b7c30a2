"""Golden parity: flax Qwen3 LM vs transformers Qwen3ForCausalLM (tiny random
config), plus QwenEmotion response-parsing behaviors."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from indextts_tpu.config import QwenEmoConfig
from indextts_tpu.models.qwen3 import Qwen3LM, greedy_generate
from indextts_tpu.runtime import torch_convert as tc
from indextts_tpu.runtime.qwen_emo import QwenEmotion, strip_thinking

TINY = QwenEmoConfig(
    vocab_size=128,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    intermediate_size=96,
    rope_theta=1e6,
)


@pytest.fixture(scope="module")
def pair():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(33)
    hf = Qwen3ForCausalLM(
        Qwen3Config(
            vocab_size=TINY.vocab_size,
            hidden_size=TINY.hidden_size,
            num_hidden_layers=TINY.num_hidden_layers,
            num_attention_heads=TINY.num_attention_heads,
            num_key_value_heads=TINY.num_key_value_heads,
            head_dim=TINY.head_dim,
            intermediate_size=TINY.intermediate_size,
            rope_theta=TINY.rope_theta,
            tie_word_embeddings=True,
            attention_dropout=0.0,
        )
    ).eval()
    model = Qwen3LM(TINY)
    params = {"params": tc.convert_qwen3(tc.to_numpy_sd(hf.state_dict()), TINY)}
    return hf, model, params


def test_qwen3_logits_parity(pair, rng):
    hf, model, params = pair
    ids = rng.integers(0, TINY.vocab_size, (1, 13)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids, jnp.int32), jnp.arange(13))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-3)


def test_qwen3_greedy_parity(pair, rng):
    hf, model, params = pair
    ids = rng.integers(0, TINY.vocab_size, (11,)).astype(np.int64)
    max_new = 8
    with torch.no_grad():
        out = hf.generate(
            torch.from_numpy(ids)[None],
            do_sample=False,
            max_new_tokens=max_new,
            eos_token_id=-1,
            pad_token_id=0,
        )
    want = out[0, len(ids):].numpy()
    got = greedy_generate(model, params, ids, max_new, eos_token_id=-1)
    np.testing.assert_array_equal(got[: len(want)], want)


def test_qwen_emotion_parsing():
    qe = QwenEmotion(lambda sys, user: '{"高兴": 0.9, "悲伤": 0.2}')
    d = qe.inference("开心的一天")
    assert d["happy"] == 0.9 and d["sad"] == 0.2
    assert list(d.keys()) == [
        "happy", "angry", "sad", "afraid", "disgusted", "melancholic",
        "surprised", "calm",
    ]


def test_qwen_emotion_regex_fallback_and_clamp():
    qe = QwenEmotion(lambda sys, user: '高兴: 2.5, 愤怒: 0.1 not json')
    d = qe.inference("text")
    assert d["happy"] == 1.2  # clamped to max
    assert abs(d["angry"] - 0.1) < 1e-9


def test_qwen_emotion_melancholic_swap():
    qe = QwenEmotion(lambda sys, user: '{"悲伤": 0.8}')
    d = qe.inference("a gloomy day")
    assert d["melancholic"] == 0.8 and d["sad"] == 0.0


def test_qwen_emotion_calm_fallback():
    qe = QwenEmotion(lambda sys, user: "{}")
    d = qe.inference("text")
    assert d["calm"] == 1.0


def test_strip_thinking():
    assert strip_thinking([5, 6, 151668, 7, 8]) == [7, 8]
    assert strip_thinking([7, 8]) == [7, 8]
