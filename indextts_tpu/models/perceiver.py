"""PerceiverResampler in flax: fixed-length latent resampling of conditioning.

Parity target: indextts/gpt/perceiver.py:224-317 (2 blocks of cross-attention
with queries included in the KV context, GEGLU feed-forward, final RMSNorm).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


class PerceiverRMSNorm(nn.Module):
    """perceiver.py RMSNorm: F.normalize(x, dim=-1) * sqrt(dim) * gamma."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        # torch F.normalize: x / max(||x||, eps) with eps=1e-12
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        out = x / jnp.maximum(norm, 1e-12)
        return out * math.sqrt(self.dim) * gamma.astype(x.dtype)


class PerceiverAttention(nn.Module):
    """perceiver.py Attention: cross-attn with queries prepended to context."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latents, context, mask: Optional[jnp.ndarray] = None):
        # latents: (B, N, D); context: (B, S, D); mask: (B, N+S) True=valid
        B, N, D = latents.shape
        ctx = jnp.concatenate([latents, context], axis=1)  # include queries
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(latents)
        kv = nn.Dense(2 * inner, use_bias=False, name="to_kv", dtype=self.dtype)(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_of(t):
            return t.reshape(B, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        scale = self.dim_head ** -0.5
        scores = jnp.einsum("bhnd,bhsd->bhns", q, k) * scale
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhns,bhsd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return nn.Dense(D, use_bias=False, name="to_out", dtype=self.dtype)(out)


class GEGLUFeedForward(nn.Module):
    """perceiver.py FeedForward: Linear(d, 2*inner) -> GEGLU -> Linear(inner, d),
    inner = int(d * mult * 2/3). GELU is exact (erf)."""

    dim: int
    mult: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult * 2 / 3)
        h = nn.Dense(2 * inner, name="proj_in", dtype=self.dtype)(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = nn.gelu(gate, approximate=False) * a
        return nn.Dense(self.dim, name="proj_out", dtype=self.dtype)(h)


class PerceiverResampler(nn.Module):
    dim: int
    dim_context: int
    num_latents: int = 32
    depth: int = 2
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        """x: (B, S, dim_context); mask: (B, num_latents + S) True=valid
        (the reference left-pads the mask with True for the latent slots,
        model_v2.py:641). Returns (B, num_latents, dim)."""
        B = x.shape[0]
        if self.dim_context != self.dim:
            x = nn.Dense(self.dim, name="proj_context", dtype=self.dtype)(x)
        latents = self.param(
            "latents", nn.initializers.normal(0.02), (self.num_latents, self.dim)
        )
        lat = jnp.broadcast_to(
            latents[None].astype(x.dtype), (B, self.num_latents, self.dim)
        )
        for i in range(self.depth):
            lat = (
                PerceiverAttention(
                    self.dim, self.heads, self.dim_head, self.dtype, name=f"attn_{i}"
                )(lat, x, mask)
                + lat
            )
            lat = GEGLUFeedForward(self.dim, self.ff_mult, self.dtype, name=f"ff_{i}")(lat) + lat
        return PerceiverRMSNorm(self.dim, self.dtype, name="norm")(lat)
