"""RepCodec semantic VQ codec in flax: Vocos-ConvNeXt encoder + factorized VQ.

Parity target: indextts/utils/maskgct/models/codec/kmeans/repcodec_model.py
(encoder = VocosBackbone 12L x 384d, quantizer = ResidualVQ with 1 FVQ
quantizer, codebook 8192 x 8, l2-normalized code lookup) and
amphion_codec/quantize/factorized_vector_quantize.py.

Inference surface (used by the engine, infer_v2.py:639 / 841):
  * quantize(x):   w2v-BERT features (B, T, 1024) -> (codes (B, T),
                   quantized embedding (B, T, 1024))
  * vq2emb(codes): codes (B, T) -> embedding (B, T, 1024)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from indextts_tpu.config import SemanticCodecConfig


class ConvNeXtBlock1d(nn.Module):
    """kmeans/vocos.py:468-527 (depthwise conv 7, LN, pw 1x1s, gamma)."""

    dim: int
    intermediate_dim: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        residual = x
        h = nn.Conv(
            self.dim,
            kernel_size=(7,),
            padding="SAME",
            feature_group_count=self.dim,
            name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(self.intermediate_dim, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        h = gamma * h
        return residual + h


class VocosBackbone(nn.Module):
    """kmeans/vocos.py:719-783."""

    input_channels: int
    dim: int
    intermediate_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, input_channels)
        h = nn.Conv(self.dim, kernel_size=(7,), padding="SAME", name="embed")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        for i in range(self.num_layers):
            h = ConvNeXtBlock1d(
                self.dim, self.intermediate_dim, name=f"convnext_{i}"
            )(h)
        return nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(h)


class FactorizedVQ(nn.Module):
    """factorized_vector_quantize.py:22-147: project to codebook_dim,
    l2-normalized nearest-neighbor lookup, project back."""

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.in_project = nn.Dense(self.codebook_dim, name="in_project")
        self.out_project = nn.Dense(self.input_dim, name="out_project")
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
        )

    def _codes_from_latents(self, z_e):
        # l2-normalize both; cosine distance == euclidean on normalized
        enc = z_e / jnp.maximum(
            jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12
        )
        cb = self.codebook / jnp.maximum(
            jnp.linalg.norm(self.codebook, axis=-1, keepdims=True), 1e-12
        )
        dist = (
            jnp.sum(enc * enc, axis=-1, keepdims=True)
            - 2.0 * enc @ cb.T
            + jnp.sum(cb * cb, axis=-1)[None, None, :]
        )
        return jnp.argmin(dist, axis=-1)

    def quantize(self, z):
        """z: (B, T, input_dim) -> (codes (B,T), z_q (B, T, input_dim))."""
        z_e = self.in_project(z)
        codes = self._codes_from_latents(z_e)
        z_q = jnp.take(self.codebook, codes, axis=0)
        return codes, self.out_project(z_q)

    def vq2emb(self, codes):
        return self.out_project(jnp.take(self.codebook, codes, axis=0))


class RepCodec(nn.Module):
    cfg: SemanticCodecConfig

    def setup(self):
        c = self.cfg
        self.encoder = VocosBackbone(
            c.hidden_size, c.vocos_dim, c.vocos_intermediate_dim, c.vocos_num_layers,
            name="encoder_backbone",
        )
        self.encoder_out = nn.Dense(c.hidden_size, name="encoder_out")
        self.quantizer = FactorizedVQ(
            c.hidden_size, c.codebook_size, c.codebook_dim, name="quantizer"
        )

    def quantize(self, x):
        """x: (B, T, hidden) w2v-BERT features -> (codes, quantized emb)."""
        h = self.encoder_out(self.encoder(x))
        return self.quantizer.quantize(h)

    def vq2emb(self, codes):
        return self.quantizer.vq2emb(codes)
