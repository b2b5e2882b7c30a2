"""Qwen3 causal LM in flax — the text->emotion-vector classifier backbone.

Parity target: transformers Qwen3ForCausalLM, as loaded by the reference's
QwenEmotion (infer_v2.py:948-1063; checkpoint `qwen0.6bemo4-merge`):
RMSNorm(1e-6) + per-head q/k norms, GQA, RoPE(theta 1e6 for 0.6B), SwiGLU,
tied embeddings for the 0.6B variant.

Includes a jitted greedy decode loop (QwenEmotion generates a short JSON
response; greedy is what `enable_thinking=False` + parsing needs).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from indextts_tpu.config import QwenEmoConfig

NEG_INF = -1e9


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (w * y).astype(x.dtype)


class QwenRMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        return _rms(x, w, self.eps)


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float):
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = positions[:, None].astype(jnp.float32) * inv[None]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_halved(x, cos, sin):
    """HF llama/qwen convention: rotate_half (split halves, not interleaved).
    x: (B, T, H, D); cos/sin: (T, D/2)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


class Qwen3Attention(nn.Module):
    cfg: QwenEmoConfig

    @nn.compact
    def __call__(self, x, positions, mask, kv_cache=None, cache_index=None):
        c = self.cfg
        B, T, _ = x.shape
        H, KV, Dh = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        q = nn.Dense(H * Dh, use_bias=False, name="q_proj")(x).reshape(B, T, H, Dh)
        k = nn.Dense(KV * Dh, use_bias=False, name="k_proj")(x).reshape(B, T, KV, Dh)
        v = nn.Dense(KV * Dh, use_bias=False, name="v_proj")(x).reshape(B, T, KV, Dh)
        q = QwenRMSNorm(Dh, c.rms_norm_eps, name="q_norm")(q)
        k = QwenRMSNorm(Dh, c.rms_norm_eps, name="k_norm")(k)
        cos, sin = rope_tables(positions, Dh, c.rope_theta)
        q = apply_rope_halved(q, cos, sin)
        k = apply_rope_halved(k, cos, sin)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        if kv_cache is not None:
            ck, cv = kv_cache
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_index, 0))
            k, v = ck, cv
            new_kv = (ck, cv)
        else:
            new_kv = (k, v)
        rep = H // KV
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(Dh)
        scores = scores + mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        return nn.Dense(x.shape[-1], use_bias=False, name="o_proj")(ctx), new_kv


class Qwen3MLP(nn.Module):
    cfg: QwenEmoConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        g = nn.Dense(c.intermediate_size, use_bias=False, name="gate_proj")(x)
        u = nn.Dense(c.intermediate_size, use_bias=False, name="up_proj")(x)
        return nn.Dense(c.hidden_size, use_bias=False, name="down_proj")(nn.silu(g) * u)


class Qwen3Block(nn.Module):
    cfg: QwenEmoConfig

    @nn.compact
    def __call__(self, x, positions, mask, kv_cache=None, cache_index=None):
        c = self.cfg
        h = QwenRMSNorm(c.hidden_size, c.rms_norm_eps, name="input_layernorm")(x)
        a, new_kv = Qwen3Attention(c, name="self_attn")(h, positions, mask, kv_cache, cache_index)
        x = x + a
        h = QwenRMSNorm(c.hidden_size, c.rms_norm_eps, name="post_attention_layernorm")(x)
        x = x + Qwen3MLP(c, name="mlp")(h)
        return x, new_kv


class Qwen3LM(nn.Module):
    cfg: QwenEmoConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        positions: jnp.ndarray,
        kv_caches=None,
        cache_index=None,
        kv_valid_len=None,
    ):
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.hidden_size, name="embed_tokens")
        x = emb(input_ids)
        B, T = input_ids.shape
        if kv_caches is None:
            causal = jnp.tril(jnp.ones((T, T), bool))
            mask = jnp.where(causal[None, None], 0.0, NEG_INF)
            new_ks, new_vs = [], []
            for i in range(c.num_hidden_layers):
                x, (k, v) = Qwen3Block(c, name=f"layer_{i}")(x, positions, mask)
                new_ks.append(k)
                new_vs.append(v)
            new_kv = (jnp.stack(new_ks), jnp.stack(new_vs))
        else:
            ks, vs = kv_caches
            Tmax = ks.shape[3]
            valid = jnp.arange(Tmax)[None, :] < kv_valid_len[:, None]
            mask = jnp.where(valid[:, None, None, :], 0.0, NEG_INF)
            new_ks, new_vs = [], []
            for i in range(c.num_hidden_layers):
                x, (k, v) = Qwen3Block(c, name=f"layer_{i}")(
                    x, positions, mask, (ks[i], vs[i]), cache_index
                )
                new_ks.append(k)
                new_vs.append(v)
            new_kv = (jnp.stack(new_ks), jnp.stack(new_vs))
        x = QwenRMSNorm(c.hidden_size, c.rms_norm_eps, name="norm")(x)
        # tied embeddings (Qwen3-0.6B): logits = x @ E^T
        logits = emb.attend(x.astype(jnp.float32))
        return logits, new_kv


def greedy_generate(
    model: Qwen3LM,
    params,
    prompt_ids: np.ndarray,
    max_new_tokens: int,
    eos_token_id: int,
) -> np.ndarray:
    """Jit-compiled greedy decode with a static KV cache."""
    c = model.cfg
    B, S = 1, len(prompt_ids)
    cap = S + max_new_tokens

    @jax.jit
    def prefill(params, ids):
        pos = jnp.arange(S)
        logits, (ks, vs) = model.apply(params, ids, pos)
        L, _, KV, _, Dh = ks.shape
        cks = jnp.zeros((L, B, KV, cap, Dh), ks.dtype)
        cvs = jnp.zeros_like(cks)
        cks = jax.lax.dynamic_update_slice(cks, ks, (0, 0, 0, 0, 0))
        cvs = jax.lax.dynamic_update_slice(cvs, vs, (0, 0, 0, 0, 0))
        return logits[:, -1], cks, cvs

    @jax.jit
    def step(params, tok, ks, vs, idx):
        pos = jnp.asarray([idx])
        logits, (ks, vs) = model.apply(
            params,
            tok[None, None],
            pos,
            kv_caches=(ks, vs),
            cache_index=idx,
            kv_valid_len=jnp.asarray([idx + 1]),
        )
        return logits[:, -1], ks, vs

    ids = jnp.asarray(np.asarray(prompt_ids)[None], jnp.int32)
    logits, ks, vs = prefill(params, ids)
    out = []
    tok = int(jnp.argmax(logits[0]))
    for i in range(max_new_tokens):
        out.append(tok)
        if tok == eos_token_id:
            break
        logits, ks, vs = step(params, jnp.asarray(tok, jnp.int32), ks, vs, S + i)
        tok = int(jnp.argmax(logits[0]))
    return np.asarray(out, np.int32)
