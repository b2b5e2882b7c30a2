"""BigVGAN v1: the IndexTTS v1 vocoder — GPT-latent input + ECAPA speaker
conditioning, flax.

Parity target: indextts/BigVGAN/models.py:130-259 — conv_pre over gpt_dim
channels, optional 4x linear feature upsampling, ECAPA speaker embedding added
after conv_pre (and optionally at each upsample stage), AMP resblocks with
anti-aliased Snake/SnakeBeta, tanh output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from indextts_tpu.models.bigvgan import AMPBlock1
from indextts_tpu.models.ecapa import ECAPA_TDNN


@dataclass(frozen=True)
class BigVGANv1Config:
    gpt_dim: int = 1280
    num_mels: int = 100
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    resblock: str = "1"
    activation: str = "snakebeta"
    snake_logscale: bool = True
    feat_upsample: bool = True
    cond_d_vector_in_each_upsampling_layer: bool = True
    speaker_embedding_dim: int = 512
    ecapa_channels: Tuple[int, ...] = (512, 512, 512, 512, 1536)
    ecapa_attention_channels: int = 128
    ecapa_res2net_scale: int = 8
    ecapa_se_channels: int = 128


class BigVGANv1(nn.Module):
    cfg: BigVGANv1Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latent: jnp.ndarray, mel_ref: jnp.ndarray) -> jnp.ndarray:
        """latent: (B, T, gpt_dim) GPT latents; mel_ref: (B, Tm, num_mels)
        reference mel for the speaker embedding. Returns (B, T_wav)."""
        c = self.cfg
        spk = ECAPA_TDNN(
            c.num_mels,
            lin_neurons=c.speaker_embedding_dim,
            channels=c.ecapa_channels,
            attention_channels=c.ecapa_attention_channels,
            res2net_scale=c.ecapa_res2net_scale,
            se_channels=c.ecapa_se_channels,
            name="speaker_encoder",
        )(mel_ref)  # (B, 1, spk_dim)

        x = latent.astype(self.dtype)
        if c.feat_upsample:
            # torch F.interpolate(mode='linear', scale_factor=4, align_corners=False)
            B, T, D = x.shape
            out_t = T * 4
            pos = (jnp.arange(out_t) + 0.5) / 4.0 - 0.5
            lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
            hi = jnp.clip(lo + 1, 0, T - 1)
            w = jnp.clip(pos - lo, 0.0, 1.0)[None, :, None]
            x = x[:, lo] * (1 - w) + x[:, hi] * w

        x = nn.Conv(
            c.upsample_initial_channel, (7,), padding="SAME", name="conv_pre",
            dtype=self.dtype,
        )(x)
        x = x + nn.Dense(c.upsample_initial_channel, name="cond_layer")(spk)

        num_kernels = len(c.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.ConvTranspose(
                ch, (k,), strides=(u,), padding="VALID", name=f"up_{i}",
                dtype=self.dtype,
            )(x)
            trim = (k - u) // 2
            if trim > 0:
                x = x[:, trim:-trim]
            if c.cond_d_vector_in_each_upsampling_layer:
                x = x + nn.Dense(ch, name=f"cond_{i}")(spk)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                r = AMPBlock1(
                    ch, rk, tuple(rd), c.snake_logscale, self.dtype,
                    name=f"resblock_{i}_{j}",
                )(x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels

        from indextts_tpu.ops.snake import anti_alias_snake

        alpha = self.param("alpha_post", nn.initializers.zeros, (x.shape[-1],))
        beta = self.param("beta_post", nn.initializers.zeros, (x.shape[-1],))
        x = anti_alias_snake(x, alpha, beta, c.snake_logscale)
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post", dtype=self.dtype)(x)
        return jnp.tanh(x[..., 0])
