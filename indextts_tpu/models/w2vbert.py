"""w2v-BERT 2.0 conformer encoder in flax (semantic feature extractor).

Parity target: transformers Wav2Vec2BertModel (the library the reference
loads at infer_v2.py:187-193), config facebook/w2v-bert-2.0: 24 conformer
layers, 1024d, 16 heads, swish, relative_key position bias, causal depthwise
conv k=31. The engine taps hidden_states[17] — the INPUT of layer 17, i.e.
the output of layer 16 — so inference only runs the first `tap_layer` layers
(the reference wastes the remaining 7; we skip them).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from indextts_tpu.config import W2VBertConfig

NEG_INF = -1e9


class W2VFeedForward(nn.Module):
    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.intermediate_size, name="intermediate_dense")(x)
        h = nn.silu(h)  # swish
        return nn.Dense(self.cfg.hidden_size, name="output_dense")(h)


class W2VSelfAttention(nn.Module):
    """relative_key attention (modeling_wav2vec2_bert.py:229-336)."""

    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        B, T, D = x.shape
        H = c.num_attention_heads
        Dh = D // H
        q = nn.Dense(D, name="linear_q")(x).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = nn.Dense(D, name="linear_k")(x).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = nn.Dense(D, name="linear_v")(x).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(Dh)

        if c.position_embeddings_type == "relative_key":
            L, R = c.left_max_position_embeddings, c.right_max_position_embeddings
            dist_table = self.param(
                "distance_embedding",
                nn.initializers.normal(0.02),
                (L + R + 1, Dh),
            )
            dist = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]  # r - l
            dist = jnp.clip(dist, -L, R) + L
            pos_emb = jnp.take(dist_table, dist, axis=0)  # (T, T, Dh)
            rel = jnp.einsum("bhld,lrd->bhlr", q, pos_emb)
            scores = scores + rel / math.sqrt(Dh)

        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name="linear_out")(ctx)


class W2VConvModule(nn.Module):
    """Causal depthwise conv module (modeling_wav2vec2_bert.py:157-227)."""

    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, pad_mask: Optional[jnp.ndarray]):
        c = self.cfg
        D = c.hidden_size
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        if pad_mask is not None:
            h = jnp.where(pad_mask[..., None], h, 0.0)
        h = nn.Dense(2 * D, use_bias=False, name="pointwise_conv1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU over channels
        # causal left pad (k-1)
        k = c.conv_depthwise_kernel_size
        h = jnp.pad(h, ((0, 0), (k - 1, 0), (0, 0)))
        h = nn.Conv(
            D,
            kernel_size=(k,),
            padding="VALID",
            feature_group_count=D,
            use_bias=False,
            name="depthwise_conv",
        )(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="depthwise_layer_norm")(h)
        h = nn.silu(h)
        return nn.Dense(D, use_bias=False, name="pointwise_conv2")(h)


class W2VEncoderLayer(nn.Module):
    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, attn_bias, pad_mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ffn1_layer_norm")(x)
        x = x + 0.5 * W2VFeedForward(c, name="ffn1")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="self_attn_layer_norm")(x)
        x = x + W2VSelfAttention(c, name="self_attn")(h, attn_bias)
        x = x + W2VConvModule(c, name="conv_module")(x, pad_mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ffn2_layer_norm")(x)
        x = x + 0.5 * W2VFeedForward(c, name="ffn2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)


class W2VBertEncoder(nn.Module):
    """feature_projection + first `tap_layer` conformer layers.

    __call__(features (B, T, 160), attention_mask (B, T) or None)
    -> (B, T, 1024): the reference's hidden_states[tap_layer]."""

    cfg: W2VBertConfig

    @nn.compact
    def __call__(self, x, attention_mask: Optional[jnp.ndarray] = None):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(x)
        h = nn.Dense(c.hidden_size, name="fp_projection")(h)
        if attention_mask is not None:
            pad_mask = attention_mask.astype(bool)
            h = jnp.where(pad_mask[..., None], h, 0.0)
            attn_bias = jnp.where(pad_mask[:, None, None, :], 0.0, NEG_INF)
        else:
            pad_mask = None
            attn_bias = None
        for i in range(c.tap_layer):
            h = W2VEncoderLayer(c, name=f"layer_{i}")(h, attn_bias, pad_mask)
        return h
