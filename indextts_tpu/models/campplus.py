"""CAMPPlus D-TDNN speaker-style encoder in flax.

Parity target: indextts/s2mel/modules/campplus/{DTDNN.py,layers.py}
(FCM 2D-conv head, dense TDNN blocks with context-aware masking (CAM),
stats pooling, 192-d embedding). Inference-only: BatchNorm uses running
stats, stored as plain params.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from indextts_tpu.config import CampPlusConfig


class BNInference(nn.Module):
    """BatchNorm eval-mode: (x - mean)/sqrt(var+eps) * scale + bias."""

    features: int
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y


class BasicResBlock(nn.Module):
    """layers.py:218-255; 2D convs stride (s,1) over (F, T)."""

    planes: int
    stride: int = 1
    in_planes: int = 0

    @nn.compact
    def __call__(self, x):
        # x: (B, F, T, C) NHWC with H=F, W=T
        # explicit (1,1) padding: torch pad=1 differs from flax SAME when
        # stride>1 (SAME pads asymmetrically)
        h = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, 1),
            padding=[(1, 1), (1, 1)], use_bias=False, name="conv1",
        )(x)
        h = BNInference(self.planes, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(h)
        h = BNInference(self.planes, name="bn2")(h)
        if self.stride != 1 or self.in_planes != self.planes:
            sc = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, 1), use_bias=False,
                name="shortcut_conv",
            )(x)
            sc = BNInference(self.planes, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class FCM(nn.Module):
    """DTDNN.py:13-48."""

    m_channels: int = 32
    feat_dim: int = 80

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F) -> torch permutes to (B, F, T); we use NHWC (B, F, T, 1)
        h = jnp.swapaxes(x, 1, 2)[..., None]
        h = nn.Conv(self.m_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(h)
        h = BNInference(self.m_channels, name="bn1")(h)
        h = nn.relu(h)
        h = BasicResBlock(self.m_channels, 2, self.m_channels, name="layer1_0")(h)
        h = BasicResBlock(self.m_channels, 1, self.m_channels, name="layer1_1")(h)
        h = BasicResBlock(self.m_channels, 2, self.m_channels, name="layer2_0")(h)
        h = BasicResBlock(self.m_channels, 1, self.m_channels, name="layer2_1")(h)
        h = nn.Conv(
            self.m_channels, (3, 3), strides=(2, 1), padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv2",
        )(h)
        h = BNInference(self.m_channels, name="bn2")(h)
        h = nn.relu(h)
        # (B, F/8, T, C) -> (B, T, C * F/8); torch reshape is (b, c*h, t) with
        # channel-major over (C, F/8)
        B, Fr, T, C = h.shape
        h = jnp.transpose(h, (0, 2, 3, 1)).reshape(B, T, C * Fr)
        return h


def seg_pool_avg(x: jnp.ndarray, seg_len: int = 100) -> jnp.ndarray:
    """layers.py:99-110: avg_pool1d(ceil_mode=True) then nearest-expand back.
    x: (B, T, C)."""
    B, T, C = x.shape
    n_seg = -(-T // seg_len)
    pad = n_seg * seg_len - T
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(B, n_seg, seg_len, C).sum(axis=2)
    counts = jnp.minimum(
        jnp.full((n_seg,), seg_len), T - jnp.arange(n_seg) * seg_len
    ).astype(x.dtype)
    means = sums / counts[None, :, None]
    expanded = jnp.repeat(means, seg_len, axis=1)[:, :T]
    return expanded


class CAMLayer(nn.Module):
    """layers.py:70-110."""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    reduction: int = 2

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        y = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=False,
            name="linear_local",
        )(x)
        context = jnp.mean(x, axis=1, keepdims=True) + seg_pool_avg(x)
        context = nn.relu(
            nn.Dense(self.bn_channels // self.reduction, name="linear1")(context)
        )
        m = nn.sigmoid(nn.Dense(self.out_channels, name="linear2")(context))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    in_channels: int
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(BNInference(self.in_channels, name="nonlinear1_bn")(x))
        h = nn.Dense(self.bn_channels, use_bias=False, name="linear1")(h)
        h = nn.relu(BNInference(self.bn_channels, name="nonlinear2_bn")(h))
        return CAMLayer(
            self.bn_channels, self.out_channels, self.kernel_size, self.dilation,
            name="cam_layer",
        )(h)


class CAMPPlus(nn.Module):
    """DTDNN.py:50-116. Input: kaldi fbank (B, T, 80) mean-normalized.
    Output: (B, embedding_size)."""

    cfg: CampPlusConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = FCM(m_channels=32, feat_dim=c.feat_dim, name="head")(x)
        channels = 32 * (c.feat_dim // 8)
        # xvector.tdnn: Conv1d(channels, init, 5, stride=2, pad 2) + bn-relu
        h = nn.Conv(
            c.init_channels, (5,), strides=(2,), padding=[(2, 2)], use_bias=False,
            name="tdnn_conv",
        )(h)
        h = nn.relu(BNInference(c.init_channels, name="tdnn_bn")(h))
        channels = c.init_channels
        for bi, (num_layers, ks, dil) in enumerate(
            zip((12, 24, 16), (3, 3, 3), (1, 2, 2))
        ):
            for li in range(num_layers):
                out = CAMDenseTDNNLayer(
                    channels + li * c.growth_rate,
                    c.growth_rate,
                    c.bn_size * c.growth_rate,
                    ks,
                    dil,
                    name=f"block{bi + 1}_tdnnd{li + 1}",
                )(h)
                h = jnp.concatenate([h, out], axis=-1)
            channels = channels + num_layers * c.growth_rate
            h = nn.relu(BNInference(channels, name=f"transit{bi + 1}_bn")(h))
            h = nn.Dense(channels // 2, use_bias=False, name=f"transit{bi + 1}_linear")(h)
            channels //= 2
        h = nn.relu(BNInference(channels, name="out_bn")(h))
        # stats pooling over time: mean + unbiased std (layers.py:26-32)
        mean = jnp.mean(h, axis=1)
        var = jnp.sum((h - mean[:, None]) ** 2, axis=1) / jnp.maximum(
            h.shape[1] - 1, 1
        )
        std = jnp.sqrt(var)
        stats = jnp.concatenate([mean, std], axis=-1)
        emb = nn.Dense(c.embedding_size, use_bias=False, name="dense_linear")(stats)
        return BNInference(c.embedding_size, affine=False, name="dense_bn")(emb)
