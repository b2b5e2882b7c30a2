"""DiscreteVAE mel tokenizer (the v1 mel-code definition), flax.

Parity target: indextts/vqvae/xtts_dvae.py:201-395 (1-d variant over mels):
strided conv encoder (+ optional resblocks), EMA codebook nearest-neighbor
quantization (inference = plain argmin lookup), transposed-conv decoder.
Used at training/data time to tokenize mels; v1 inference only needs the
code ids definition.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class DVAEConfig:
    channels: int = 100  # mel bins
    num_tokens: int = 8192
    codebook_dim: int = 512
    hidden_dim: int = 512
    num_layers: int = 2
    num_resnet_blocks: int = 3
    kernel_size: int = 3
    stride: int = 2


class DVAEResBlock(nn.Module):
    chan: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.chan, (3,), padding="SAME", name="conv_0")(x)
        h = nn.relu(h)
        h = nn.Conv(self.chan, (3,), padding="SAME", name="conv_1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.chan, (1,), name="conv_2")(h)
        return h + x


class DVAE(nn.Module):
    cfg: DVAEConfig

    def setup(self):
        c = self.cfg
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0), (c.codebook_dim, c.num_tokens)
        )

    @nn.compact
    def _encode_impl(self, mel):
        c = self.cfg
        h = mel  # (B, T, channels)
        pad = (c.kernel_size - 1) // 2
        for i in range(c.num_layers):
            ch = c.hidden_dim * (2 ** i)
            h = nn.Conv(
                ch, (c.kernel_size,), strides=(c.stride,),
                padding=[(pad, pad)], name=f"enc_conv_{i}",
            )(h)
            h = nn.relu(h)
        for r in range(c.num_resnet_blocks):
            h = DVAEResBlock(h.shape[-1], name=f"enc_res_{r}")(h)
        return nn.Conv(c.codebook_dim, (1,), name="enc_out")(h)

    def encode_latents(self, mel):
        return self._encode_impl(mel)

    def get_codebook_indices(self, mel):
        """(B, T, channels) mel -> (B, T//stride^layers) code ids
        (Quantize.forward argmin, xtts_dvae.py:86-92)."""
        z = self._encode_impl(mel)  # (B, T', D)
        flat = z.reshape(-1, z.shape[-1])
        dist = (
            jnp.sum(flat * flat, axis=1, keepdims=True)
            - 2.0 * flat @ self.codebook
            + jnp.sum(self.codebook * self.codebook, axis=0)[None]
        )
        idx = jnp.argmin(dist, axis=1)
        return idx.reshape(z.shape[:-1])

    def embed_code(self, ids):
        return jnp.take(self.codebook.T, ids, axis=0)
