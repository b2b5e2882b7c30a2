"""BigVGAN v2 vocoder in flax/JAX, TPU-first.

Parity target: indextts/s2mel/modules/bigvgan/bigvgan.py:243-400 with the
`nvidia/bigvgan_v2_22khz_80band_256x` hyperparameters (AMPBlock1, snakebeta
with log-scale alphas, no bias/tanh at final, 256x upsampling).

The anti-aliased Snake activation (2x kaiser-sinc upsample -> snakebeta ->
2x kaiser-sinc downsample, replicate padding — the reference ships a fused
CUDA kernel for this, alias_free_activation/cuda/anti_alias_activation_cuda.cu)
lives in ops/snake.py with a fused Pallas TPU kernel and an XLA fallback of
identical semantics.

Layout: all activations are (B, T, C) [NLC] so convs map onto XLA's
conv_general_dilated with MXU-friendly channel contractions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from indextts_tpu.config import BigVGANConfig
from indextts_tpu.ops.snake import anti_alias_snake


class AMPBlock1(nn.Module):
    """bigvgan.py:31-147: interleaved snake-activated dilated + plain convs."""

    channels: int
    kernel_size: int
    dilations: tuple
    snake_logscale: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.dilations)
        alphas = [
            self.param(f"alpha1_{j}", nn.initializers.zeros, (self.channels,))
            for j in range(n)
        ] + [
            self.param(f"alpha2_{j}", nn.initializers.zeros, (self.channels,))
            for j in range(n)
        ]
        betas = [
            self.param(f"beta1_{j}", nn.initializers.zeros, (self.channels,))
            for j in range(n)
        ] + [
            self.param(f"beta2_{j}", nn.initializers.zeros, (self.channels,))
            for j in range(n)
        ]
        # activations list order in reference: acts1 = activations[::2] pair
        # with convs1 (dilated), acts2 = activations[1::2] pair with convs2
        for j, d in enumerate(self.dilations):
            a1, b1 = alphas[j], betas[j]
            a2, b2 = alphas[n + j], betas[n + j]
            # NOTE reference ModuleList order is [a1_0, a2_0, a1_1, a2_1, ...]
            xt = anti_alias_snake(x, a1, b1, self.snake_logscale)
            xt = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(d,),
                padding="SAME",
                name=f"conv1_{j}",
                dtype=self.dtype,
            )(xt)
            xt = anti_alias_snake(xt, a2, b2, self.snake_logscale)
            xt = nn.Conv(
                self.channels,
                (self.kernel_size,),
                padding="SAME",
                name=f"conv2_{j}",
                dtype=self.dtype,
            )(xt)
            x = x + xt
        return x


class BigVGAN(nn.Module):
    cfg: BigVGANConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel: (B, n_mels, T) -> waveform (B, T * 256)."""
        c = self.cfg
        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)  # (B, T, M)
        x = nn.Conv(
            c.upsample_initial_channel, (7,), padding="SAME", name="conv_pre",
            dtype=self.dtype,
        )(x)

        num_kernels = len(c.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            # ConvTranspose1d(k, stride=u, padding=(k-u)//2): output length
            # T*u. flax ConvTranspose pads differently; emulate torch exactly:
            # full transposed conv then trim (k-u)//2 from both sides.
            x = nn.ConvTranspose(
                ch,
                (k,),
                strides=(u,),
                padding="VALID",
                name=f"up_{i}",
                dtype=self.dtype,
            )(x)
            trim = (k - u) // 2
            if trim > 0:
                x = x[:, trim:-trim]
            xs = None
            for j, (rk, rd) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                r = AMPBlock1(
                    ch,
                    rk,
                    tuple(rd),
                    c.snake_logscale,
                    self.dtype,
                    name=f"resblock_{i}_{j}",
                )(x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels

        alpha = self.param("alpha_post", nn.initializers.zeros, (x.shape[-1],))
        beta = self.param("beta_post", nn.initializers.zeros, (x.shape[-1],))
        x = anti_alias_snake(x, alpha, beta, c.snake_logscale)
        x = nn.Conv(
            1,
            (7,),
            padding="SAME",
            use_bias=c.use_bias_at_final,
            name="conv_post",
            dtype=self.dtype,
        )(x)
        x = x[..., 0]
        if c.use_tanh_at_final:
            x = jnp.tanh(x)
        else:
            x = jnp.clip(x, -1.0, 1.0)
        return x
