"""Golden parity: flax w2v-BERT encoder vs transformers Wav2Vec2BertModel
(tiny random config). The tap semantics (hidden_states[k]) are verified."""

import numpy as np
import pytest
import torch

from indextts_tpu.config import W2VBertConfig
from indextts_tpu.models.w2vbert import W2VBertEncoder
from indextts_tpu.runtime import torch_convert as tc

import jax.numpy as jnp

TINY = W2VBertConfig(
    hidden_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=96,
    feature_projection_input_dim=20,
    conv_depthwise_kernel_size=7,
    left_max_position_embeddings=8,
    right_max_position_embeddings=2,
    tap_layer=3,
)


@pytest.fixture(scope="module")
def pair():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    torch.manual_seed(21)
    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        intermediate_size=TINY.intermediate_size,
        feature_projection_input_dim=TINY.feature_projection_input_dim,
        conv_depthwise_kernel_size=TINY.conv_depthwise_kernel_size,
        left_max_position_embeddings=TINY.left_max_position_embeddings,
        right_max_position_embeddings=TINY.right_max_position_embeddings,
        position_embeddings_type="relative_key",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        conformer_conv_dropout=0.0,
        layerdrop=0.0,
    )
    ref = Wav2Vec2BertModel(hf_cfg).eval()
    model = W2VBertEncoder(TINY)
    params = {"params": tc.convert_w2vbert(tc.to_numpy_sd(ref.state_dict()), TINY)}
    return ref, model, params


def test_w2vbert_tap_parity(pair, rng):
    ref, model, params = pair
    B, T = 1, 37
    x = rng.standard_normal((B, T, TINY.feature_projection_input_dim)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.int64)
    with torch.no_grad():
        out = ref(
            input_features=torch.from_numpy(x),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    want = out.hidden_states[TINY.tap_layer].numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_w2vbert_padded_mask(pair, rng):
    ref, model, params = pair
    B, T = 2, 30
    x = rng.standard_normal((B, T, TINY.feature_projection_input_dim)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.int64)
    mask[1, 22:] = 0
    with torch.no_grad():
        out = ref(
            input_features=torch.from_numpy(x),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    want = out.hidden_states[TINY.tap_layer].numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(mask)))
    # compare valid region only (padded positions are don't-care)
    np.testing.assert_allclose(got[0], want[0], atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(got[1, :22], want[1, :22], atol=5e-5, rtol=1e-3)
