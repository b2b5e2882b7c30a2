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
    """bigvgan.py:31-147: interleaved snake-activated dilated + plain convs.

    setup-based (not compact) so BigVGAN's lockstep stage path can drive the
    three sibling resblocks' structurally-identical steps together (one wide
    anti-alias-snake call over 3C channels instead of three) while the param
    tree stays exactly the reference layout (resblock_{i}_{j}/conv1_{k}, ...).
    """

    channels: int
    kernel_size: int
    dilations: tuple
    snake_logscale: bool
    dtype: Any = jnp.float32

    def setup(self):
        n = len(self.dilations)
        # NOTE reference ModuleList order is [a1_0, a2_0, a1_1, a2_1, ...]:
        # acts1 = activations[::2] pair with convs1 (dilated), acts2 with convs2
        self.alphas1 = [
            self.param(f"alpha1_{j}", nn.initializers.zeros, (self.channels,))
            for j in range(n)
        ]
        self.alphas2 = [
            self.param(f"alpha2_{j}", nn.initializers.zeros, (self.channels,))
            for j in range(n)
        ]
        self.betas1 = [
            self.param(f"beta1_{j}", nn.initializers.zeros, (self.channels,))
            for j in range(n)
        ]
        self.betas2 = [
            self.param(f"beta2_{j}", nn.initializers.zeros, (self.channels,))
            for j in range(n)
        ]
        self.convs1 = [
            nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(d,),
                padding="SAME",
                name=f"conv1_{j}",
                dtype=self.dtype,
            )
            for j, d in enumerate(self.dilations)
        ]
        self.convs2 = [
            nn.Conv(
                self.channels,
                (self.kernel_size,),
                padding="SAME",
                name=f"conv2_{j}",
                dtype=self.dtype,
            )
            for j in range(n)
        ]

    def coeffs(self, j):
        """Snake (alpha, beta) pairs for dilation step j."""
        return self.alphas1[j], self.betas1[j], self.alphas2[j], self.betas2[j]

    def conv1(self, x, j):
        return self.convs1[j](x)

    def conv2(self, x, j):
        return self.convs2[j](x)

    def __call__(self, x):
        for j in range(len(self.dilations)):
            a1, b1, a2, b2 = self.coeffs(j)
            xt = anti_alias_snake(x, a1, b1, self.snake_logscale)
            xt = self.convs1[j](xt)
            xt = anti_alias_snake(xt, a2, b2, self.snake_logscale)
            xt = self.convs2[j](xt)
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
            rs = [
                AMPBlock1(
                    ch,
                    rk,
                    tuple(rd),
                    c.snake_logscale,
                    self.dtype,
                    name=f"resblock_{i}_{j}",
                )
                for j, (rk, rd) in enumerate(
                    zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
                )
            ]
            dil0 = tuple(c.resblock_dilation_sizes[0])
            if all(tuple(d) == dil0 for d in c.resblock_dilation_sizes):
                # lockstep: the parallel resblocks share structure, so run
                # their steps together with ONE wide activation over the
                # channel-concatenated groups (3x fewer anti-alias-snake
                # launches; identical math — channels never mix)
                G = len(rs)
                X = jnp.concatenate([x] * G, axis=-1)  # (B, T, G*ch)
                for j in range(len(dil0)):
                    cs = [r.coeffs(j) for r in rs]
                    a1 = jnp.concatenate([cc[0] for cc in cs])
                    b1 = jnp.concatenate([cc[1] for cc in cs])
                    a2 = jnp.concatenate([cc[2] for cc in cs])
                    b2 = jnp.concatenate([cc[3] for cc in cs])
                    xt = anti_alias_snake(X, a1, b1, c.snake_logscale)
                    xt = jnp.concatenate(
                        [r.conv1(xt[..., g * ch:(g + 1) * ch], j)
                         for g, r in enumerate(rs)], axis=-1,
                    )
                    xt = anti_alias_snake(xt, a2, b2, c.snake_logscale)
                    xt = jnp.concatenate(
                        [r.conv2(xt[..., g * ch:(g + 1) * ch], j)
                         for g, r in enumerate(rs)], axis=-1,
                    )
                    X = X + xt
                xs = sum(X[..., g * ch:(g + 1) * ch] for g in range(G))
            else:
                xs = None
                for r in rs:
                    out = r(x)
                    xs = out if xs is None else xs + out
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
