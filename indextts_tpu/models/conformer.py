"""Wenet-style Conformer encoder in flax (speaker / emotion conditioning).

Parity target: indextts/gpt/conformer_encoder.py (ConformerEncoder with
Conv2dSubsampling2 input layer, rel-pos multi-head attention WITHOUT the
rel_shift term — see conformer/attention.py:304-306 where rel_shift is
disabled — SiLU activations, conv module kernel 15, normalize_before=True,
macaron off, dropout 0 at inference).

All ops are dense matmuls/convs -> straight XLA; no kernels needed.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from indextts_tpu.config import ConditionModuleConfig

NEG_INF = -1e9


def sinusoid_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """ESPnet PositionalEncoding table (conformer/embedding.py:46-55)."""
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(
        np.arange(0, d_model, 2).astype(np.float64) * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def make_nonpad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) True on valid positions."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


class Conv2dSubsampling2(nn.Module):
    """Conv2d(1->odim, 3x3, stride 2) + ReLU + Linear (subsampling.py:135-185)."""

    odim: int
    idim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, idim) -> (B, T', odim); T' = (T-1)//2
        x = x[..., None]  # NHWC: (B, T, F, 1)
        x = nn.Conv(
            features=self.odim,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding="VALID",
            name="conv",
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        B, Tp, Fp, C = x.shape
        # torch: x.transpose(1,2).view(b, t, c*f) — channel-major flatten
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, Tp, C * Fp)
        x = nn.Dense(self.odim, name="out", dtype=self.dtype)(x)
        return x


class RelPositionAttention(nn.Module):
    """conformer/attention.py:195-312 (rel_shift disabled)."""

    heads: int
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask):
        # x: (B, T, D), pos_emb: (1, T, D), mask: (B, T) True=valid
        B, T, D = x.shape
        H, Dk = self.heads, self.dim // self.heads
        q = nn.Dense(D, name="linear_q", dtype=self.dtype)(x)
        k = nn.Dense(D, name="linear_k", dtype=self.dtype)(x)
        v = nn.Dense(D, name="linear_v", dtype=self.dtype)(x)
        p = nn.Dense(D, use_bias=False, name="linear_pos", dtype=self.dtype)(pos_emb)

        pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(), (H, Dk)
        )
        pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(), (H, Dk)
        )

        def heads_of(t, length):
            return t.reshape(B if t.shape[0] == B else 1, length, H, Dk)

        q = q.reshape(B, T, H, Dk)
        k = k.reshape(B, T, H, Dk).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, Dk).transpose(0, 2, 1, 3)
        p = p.reshape(1, -1, H, Dk).transpose(0, 2, 1, 3)  # (1, H, T, Dk)

        q_u = (q + pos_bias_u.astype(q.dtype)).transpose(0, 2, 1, 3)  # (B,H,T,Dk)
        q_v = (q + pos_bias_v.astype(q.dtype)).transpose(0, 2, 1, 3)

        matrix_ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k)
        matrix_bd = jnp.einsum("bhtd,xhsd->bhts", q_v, p)
        scores = (matrix_ac + matrix_bd) / math.sqrt(Dk)

        # forward_attention (attention.py:77-121): -inf fill + post-softmax zero
        m = mask[:, None, None, :]
        scores = jnp.where(m, scores, NEG_INF)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        attn = jnp.where(m, attn, 0.0)
        ctx = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name="linear_out", dtype=self.dtype)(ctx)


class ConvolutionModule(nn.Module):
    """conformer_encoder.py:56-167: GLU pointwise, depthwise k=15, LN, SiLU."""

    channels: int
    kernel_size: int = 15
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        # x: (B, T, C); pad_mask (B, T) True=valid
        x = jnp.where(pad_mask[..., None], x, 0.0)
        h = nn.Dense(2 * self.channels, name="pointwise_conv1", dtype=self.dtype)(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU over channel dim
        # depthwise conv, 'SAME' padding (torch padding=(k-1)//2)
        h = nn.Conv(
            features=self.channels,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            feature_group_count=self.channels,
            name="depthwise_conv",
            dtype=self.dtype,
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Dense(self.channels, name="pointwise_conv2", dtype=self.dtype)(h)
        h = jnp.where(pad_mask[..., None], h, 0.0)
        return h


class ConformerFFN(nn.Module):
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="w_1", dtype=self.dtype)(x)
        h = nn.silu(h)
        return nn.Dense(x.shape[-1], name="w_2", dtype=self.dtype)(h)


class ConformerLayer(nn.Module):
    cfg: ConditionModuleConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask):
        d = self.cfg.output_size
        # attention (normalize_before)
        h = nn.LayerNorm(epsilon=1e-5, name="norm_mha", dtype=self.dtype)(x)
        x = x + RelPositionAttention(
            self.cfg.attention_heads, d, self.dtype, name="self_attn"
        )(h, pos_emb, mask)
        # conv module
        h = nn.LayerNorm(epsilon=1e-5, name="norm_conv", dtype=self.dtype)(x)
        x = x + ConvolutionModule(
            d, self.cfg.cnn_module_kernel, self.dtype, name="conv_module"
        )(h, mask)
        # ffn
        h = nn.LayerNorm(epsilon=1e-5, name="norm_ff", dtype=self.dtype)(x)
        x = x + ConformerFFN(self.cfg.linear_units, self.dtype, name="feed_forward")(h)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_final", dtype=self.dtype)(x)
        return x


class ConformerEncoder(nn.Module):
    """Returns (encoded (B,T',D), mask (B,T') True=valid)."""

    cfg: ConditionModuleConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, xs_lens):
        B, T, _ = xs.shape
        mask = make_nonpad_mask(xs_lens, T)
        xs = Conv2dSubsampling2(
            self.cfg.output_size, self.cfg.input_size, self.dtype, name="embed"
        )(xs)
        Tp = xs.shape[1]
        # subsampled mask: torch x_mask[:, :, 2::2]
        mask = mask[:, 2::2][:, :Tp]
        # rel-pos encoding: x scaled by sqrt(d), pos table slice
        xs = xs * math.sqrt(self.cfg.output_size)
        pe = sinusoid_position_encoding(max(5000, Tp), self.cfg.output_size)
        pos_emb = jnp.asarray(pe[None, :Tp]).astype(xs.dtype)
        for i in range(self.cfg.num_blocks):
            xs = ConformerLayer(self.cfg, self.dtype, name=f"layer_{i}")(
                xs, pos_emb, mask
            )
        xs = nn.LayerNorm(epsilon=1e-5, name="after_norm", dtype=self.dtype)(xs)
        return xs, mask
