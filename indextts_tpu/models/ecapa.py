"""ECAPA-TDNN speaker encoder in flax (v1 BigVGAN conditioning).

Parity target: indextts/BigVGAN/ECAPA_TDNN.py (speechbrain-derived):
TDNN blocks with reflect-'same' padding, Res2Net with hierarchical residual
chunks, SE blocks, multi-layer feature aggregation, attentive statistics
pooling with global context, BatchNorm in eval mode.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from indextts_tpu.models.campplus import BNInference


def _same_reflect_conv(x, features, kernel, dilation, name):
    """speechbrain Conv1d 'same' padding: reflect pad d(k-1)/2 each side,
    then VALID conv (nnet/CNN.py:458-544)."""
    pad = dilation * (kernel - 1) // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    return nn.Conv(
        features, (kernel,), kernel_dilation=(dilation,), padding="VALID", name=name
    )(x)


class TDNNBlock(nn.Module):
    out_channels: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = _same_reflect_conv(x, self.out_channels, self.kernel, self.dilation, "conv")
        h = nn.relu(h)
        return BNInference(self.out_channels, name="norm")(h)


class Res2NetBlock(nn.Module):
    out_channels: int
    scale: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        chunks = jnp.split(x, self.scale, axis=-1)
        ys = []
        y = None
        for i, xi in enumerate(chunks):
            if i == 0:
                y = xi
            elif i == 1:
                y = TDNNBlock(
                    self.out_channels // self.scale, self.kernel, self.dilation,
                    name=f"block_{i - 1}",
                )(xi)
            else:
                y = TDNNBlock(
                    self.out_channels // self.scale, self.kernel, self.dilation,
                    name=f"block_{i - 1}",
                )(xi + y)
            ys.append(y)
        return jnp.concatenate(ys, axis=-1)


class SEBlock(nn.Module):
    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=1, keepdims=True)
        s = nn.relu(nn.Dense(self.se_channels, name="conv1")(s))
        s = nn.sigmoid(nn.Dense(self.out_channels, name="conv2")(s))
        return s * x


class SERes2NetBlock(nn.Module):
    out_channels: int
    res2net_scale: int
    se_channels: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = nn.Dense(self.out_channels, name="shortcut")(x)
        h = TDNNBlock(self.out_channels, 1, 1, name="tdnn1")(x)
        h = Res2NetBlock(
            self.out_channels, self.res2net_scale, self.kernel, self.dilation,
            name="res2net_block",
        )(h)
        h = TDNNBlock(self.out_channels, 1, 1, name="tdnn2")(h)
        h = SEBlock(self.se_channels, self.out_channels, name="se_block")(h)
        return h + residual


class AttentiveStatsPooling(nn.Module):
    channels: int
    attention_channels: int = 128
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C); full-length (no padding) inference
        T = x.shape[1]
        m = 1.0 / T
        mean = jnp.mean(x, axis=1)
        std = jnp.sqrt(
            jnp.maximum(jnp.mean((x - mean[:, None]) ** 2, axis=1), self.eps)
        )
        attn_in = jnp.concatenate(
            [x, jnp.broadcast_to(mean[:, None], x.shape),
             jnp.broadcast_to(std[:, None], x.shape)], axis=-1,
        )
        h = TDNNBlock(self.attention_channels, 1, 1, name="tdnn")(attn_in)
        h = jnp.tanh(h)
        attn = nn.Dense(self.channels, name="conv")(h)
        w = jax.nn.softmax(attn, axis=1)
        mean2 = jnp.sum(w * x, axis=1)
        std2 = jnp.sqrt(
            jnp.maximum(jnp.sum(w * (x - mean2[:, None]) ** 2, axis=1), self.eps)
        )
        return jnp.concatenate([mean2, std2], axis=-1)


class ECAPA_TDNN(nn.Module):
    input_size: int
    lin_neurons: int = 192
    channels: Tuple[int, ...] = (512, 512, 512, 512, 1536)
    kernel_sizes: Tuple[int, ...] = (5, 3, 3, 3, 1)
    dilations: Tuple[int, ...] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128

    @nn.compact
    def __call__(self, x):
        """x: (B, T, input_size) -> (B, 1, lin_neurons)."""
        ch = self.channels
        h = TDNNBlock(ch[0], self.kernel_sizes[0], self.dilations[0], name="block_0")(x)
        feats = []
        for i in range(1, len(ch) - 1):
            h = SERes2NetBlock(
                ch[i], self.res2net_scale, self.se_channels,
                self.kernel_sizes[i], self.dilations[i], name=f"block_{i}",
            )(h)
            feats.append(h)
        h = jnp.concatenate(feats, axis=-1)
        h = TDNNBlock(ch[-1], self.kernel_sizes[-1], self.dilations[-1], name="mfa")(h)
        pooled = AttentiveStatsPooling(
            ch[-1], self.attention_channels, name="asp"
        )(h)
        pooled = BNInference(ch[-1] * 2, name="asp_bn")(pooled)
        out = nn.Dense(self.lin_neurons, name="fc")(pooled)
        return out[:, None, :]
