"""Semantic->mel stage: length regulator + DiT flow-matching estimator, flax.

Parity targets (reference):
  * InterpolateRegulator       s2mel/modules/length_regulator.py:28-141
  * DiT + gpt_fast Transformer s2mel/modules/diffusion_transformer.py:103-257,
                               s2mel/modules/gpt_fast/model.py
  * WN final layer             s2mel/modules/wavenet.py:103-166 (SConv1d =
                               reflect-pad + VALID conv; the ctor's `padding=`
                               kwarg is silently dropped, encodec.py:196-228)
  * gpt_layer MLP              s2mel/modules/commons.py:413 (3 linears, no act)
  * CFM Euler solver           s2mel/modules/flow_matching.py:30-115 (in
                               runtime/s2mel_infer.py)

TPU-first notes: the DiT runs full-sequence bidirectional attention over
~2-3k frames — a handful of MXU-dense matmuls per step; the 20-step Euler
loop compiles to one program with `lax.fori_loop`, CFG via a stacked 2B batch
exactly like the reference's single batched estimator call.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from indextts_tpu.config import DiTConfig, LengthRegulatorConfig, S2MelConfig, WaveNetConfig

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# small pieces
# ---------------------------------------------------------------------------


class TimestepEmbedder(nn.Module):
    """diffusion_transformer.py:19-60 (scale=1000, max_period=10000)."""

    hidden: int
    freq_dim: int = 256

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.freq_dim // 2
        freqs = jnp.exp(
            -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = 1000.0 * t[:, None].astype(jnp.float32) * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        h = nn.Dense(self.hidden, name="mlp_0")(emb)
        h = nn.silu(h)
        return nn.Dense(self.hidden, name="mlp_2")(h)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (out.astype(x.dtype)) * weight


class AdaptiveRMSNorm(nn.Module):
    """gpt_fast AdaptiveLayerNorm wrapping RMSNorm (model.py:20-38)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, c: Optional[jnp.ndarray]):
        rms_w = self.param("rms_weight", nn.initializers.ones, (self.dim,))
        normed = rms_norm(x, rms_w, self.eps)
        if c is None:
            return normed
        wb = nn.Dense(2 * self.dim, name="project_layer")(c)
        weight, bias = jnp.split(wb, 2, axis=-1)
        return weight * normed + bias


def precompute_rope(table_size: int, head_dim: int, base: float) -> np.ndarray:
    """gpt_fast precompute_freqs_cis (model.py:336-345): (T, hd/2, 2)."""
    freqs = 1.0 / (
        base ** (np.arange(0, head_dim, 2)[: head_dim // 2].astype(np.float64) / head_dim)
    )
    t = np.arange(table_size, dtype=np.float64)
    ang = np.outer(t, freqs)
    return np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)


def apply_rotary(x: jnp.ndarray, rope: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, D); rope: (T, D/2, 2) — interleaved-pair rotation."""
    xs = x.reshape(*x.shape[:-1], -1, 2)
    cos = rope[None, :, None, :, 0]
    sin = rope[None, :, None, :, 1]
    out = jnp.stack(
        [xs[..., 0] * cos - xs[..., 1] * sin, xs[..., 1] * cos + xs[..., 0] * sin],
        axis=-1,
    )
    return out.reshape(x.shape).astype(x.dtype)


class DiTAttention(nn.Module):
    """gpt_fast Attention (model.py:242-308), fused wqkv, RoPE, SDPA.

    The DiT's full-sequence bidirectional attention is the CFM solve's
    bandwidth ceiling at batch: materializing (B, H, T, T) fp32 scores for
    the softmax costs ~0.7 GB per layer per step at B=16/T=1200 (measured
    1.48 s of the 3.5 s batched-e2e wall on v5e). On TPU the Pallas flash
    kernel computes the same softmax blockwise in VMEM — the score tensor
    never touches HBM. Key-padding is expressed as kv segment ids (pad kv
    excluded for every query; pad QUERIES attend normally so their outputs
    stay finite — the reference's mask has the same one-sided semantics,
    diffusion_transformer.py attn key mask). TARS_DIT_FLASH=0 forces the
    XLA path; CPU always uses it."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, rope, mask):
        c = self.cfg
        B, T, D = x.shape
        H, Dh = c.num_heads, c.head_dim
        qkv = nn.Dense(3 * H * Dh, use_bias=False, name="wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rotary(q.reshape(B, T, H, Dh), rope)
        k = apply_rotary(k.reshape(B, T, H, Dh), rope)
        v = v.reshape(B, T, H, Dh)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        ctx = self._flash(q, k, v, mask, B, T, H, Dh)
        if ctx is None:
            scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(Dh)
            scores = jnp.where(mask, scores, NEG_INF)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
            ctx = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        return nn.Dense(D, use_bias=False, name="wo")(ctx)

    @staticmethod
    def _flash(q, k, v, mask, B, T, H, Dh):
        """Pallas TPU flash attention over the key-padding mask; returns
        None when the fused path is unavailable (non-TPU, disabled, or tiny
        T where the XLA softmax is fine)."""
        import os

        if (
            os.environ.get("TARS_DIT_FLASH", "1") != "1"
            or jax.default_backend() != "tpu"
            or T < 256
        ):
            return None
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                SegmentIds,
                flash_attention,
            )
        except ImportError:
            return None
        # pad the sequence to a multiple of the kernel block (pads are
        # excluded via segment ids, so only the buffer grows)
        blk_grid = 512 if T >= 512 else 256 if T >= 256 else 128
        Tp = -(-T // blk_grid) * blk_grid
        pad = Tp - T
        kv_seg = jnp.broadcast_to(
            mask[:, 0, 0, :].astype(jnp.int32), (B, T)
        )
        if pad:
            padT = [(0, 0), (0, 0), (0, pad), (0, 0)]
            q = jnp.pad(q, padT)
            k = jnp.pad(k, padT)
            v = jnp.pad(v, padT)
            kv_seg = jnp.pad(kv_seg, [(0, 0), (0, pad)])
        # pad kv rows get segment 0 != 1: excluded for every query; all
        # queries (incl. pads) carry segment 1 so no row is fully masked
        seg = SegmentIds(q=jnp.ones((B, Tp), jnp.int32), kv=kv_seg)
        blk = blk_grid
        bs = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
            block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
            block_q_dq=blk,
        )
        ctx = flash_attention(
            q, k, v, segment_ids=seg, causal=False,
            sm_scale=1.0 / math.sqrt(Dh), block_sizes=bs,
        )
        return ctx[:, :, :T, :]


class DiTFeedForward(nn.Module):
    """SwiGLU (model.py:311-319)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h1 = nn.Dense(c.intermediate_size, use_bias=False, name="w1")(x)
        h3 = nn.Dense(c.intermediate_size, use_bias=False, name="w3")(x)
        return nn.Dense(c.hidden_dim, use_bias=False, name="w2")(nn.silu(h1) * h3)


class DiTBlock(nn.Module):
    cfg: DiTConfig
    receive_skip: bool

    @nn.compact
    def __call__(self, x, c_emb, rope, mask, skip_in):
        cfg = self.cfg
        if self.receive_skip and skip_in is not None:
            x = nn.Dense(cfg.hidden_dim, name="skip_in_linear")(
                jnp.concatenate([x, skip_in], axis=-1)
            )
        h = AdaptiveRMSNorm(cfg.hidden_dim, cfg.norm_eps, name="attention_norm")(x, c_emb)
        x = x + DiTAttention(cfg, name="attention")(h, rope, mask)
        h = AdaptiveRMSNorm(cfg.hidden_dim, cfg.norm_eps, name="ffn_norm")(x, c_emb)
        x = x + DiTFeedForward(cfg, name="feed_forward")(h)
        return x


class DiTTransformer(nn.Module):
    """gpt_fast Transformer with u-vit skips (model.py:121-191)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, c_emb, mask):
        cfg = self.cfg
        T = x.shape[1]
        rope_table = jnp.asarray(
            precompute_rope(cfg.rope_table_size, cfg.head_dim, cfg.rope_base)
        )
        rope = rope_table[:T]
        n = cfg.depth
        emit = [i for i in range(n) if i < n // 2] if cfg.uvit_skip_connection else []
        recv = [i for i in range(n) if i > n // 2] if cfg.uvit_skip_connection else []
        skips = []
        for i in range(n):
            skip_in = skips.pop() if i in recv and skips else None
            x = DiTBlock(cfg, receive_skip=(i in recv), name=f"layer_{i}")(
                x, c_emb, rope, mask, skip_in
            )
            if i in emit:
                skips.append(x)
        return AdaptiveRMSNorm(cfg.hidden_dim, cfg.norm_eps, name="norm")(x, c_emb)


class WaveNet(nn.Module):
    """WN gated dilated conv stack (wavenet.py:103-166)."""

    cfg: WaveNetConfig

    @nn.compact
    def __call__(self, x, x_mask, g):
        """x: (B, T, C); x_mask: (B, T, 1); g: (B, 1, gin)."""
        c = self.cfg
        C = c.hidden_dim
        g_all = nn.Dense(2 * C * c.num_layers, name="cond_layer")(g)  # (B,1,2C*n)
        output = jnp.zeros_like(x)
        T = x.shape[1]
        # reflect at each row's VALID boundary (x_mask prefix length), not the
        # physical buffer edge: a bucketed row then matches the reference's
        # exact-length reflect pad (encodec.py:196-228) sample for sample
        xl = jnp.maximum(x_mask[..., 0].sum(axis=1, keepdims=True), 1).astype(jnp.int32)
        for i in range(c.num_layers):
            dilation = c.dilation_rate ** i
            eff_k = (c.kernel_size - 1) * dilation + 1
            pad_r = (eff_k - 1) // 2
            pad_l = eff_k - 1 - pad_r
            pos = jnp.arange(-pad_l, T + pad_r)[None, :]  # (1, T+pads)
            q = jnp.where(pos < 0, -pos, pos)
            q = jnp.where(q >= xl, 2 * xl - 2 - q, q)
            q = jnp.clip(q, 0, T - 1)
            q = jnp.broadcast_to(q, (x.shape[0], q.shape[1]))
            xp = jnp.take_along_axis(x, q[..., None], axis=1)
            x_in = nn.Conv(
                2 * C,
                kernel_size=(c.kernel_size,),
                kernel_dilation=(dilation,),
                padding="VALID",
                name=f"in_layer_{i}",
            )(xp)
            g_l = g_all[:, :, i * 2 * C : (i + 1) * 2 * C]
            acts_in = x_in + g_l
            acts = jnp.tanh(acts_in[..., :C]) * nn.sigmoid(acts_in[..., C:])
            res_skip = nn.Dense(
                2 * C if i < c.num_layers - 1 else C, name=f"res_skip_{i}"
            )(acts)
            if i < c.num_layers - 1:
                x = (x + res_skip[..., :C]) * x_mask
                output = output + res_skip[..., C:]
            else:
                output = output + res_skip
        return output * x_mask


class FinalLayer(nn.Module):
    """diffusion_transformer.py:84-101 (LayerNorm no-affine eps 1e-6 + adaLN)."""

    hidden: int

    @nn.compact
    def __call__(self, x, c):
        ln = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, name="norm_final"
        )(x)
        sc = nn.Dense(2 * self.hidden, name="adaLN_1")(nn.silu(c))
        shift, scale = jnp.split(sc, 2, axis=-1)
        h = ln * (1.0 + scale[:, None]) + shift[:, None]
        return nn.Dense(self.hidden, name="linear")(h)


class DiT(nn.Module):
    """Flow-matching velocity estimator (diffusion_transformer.py:103-257)."""

    cfg: DiTConfig
    wavenet_cfg: WaveNetConfig

    @nn.compact
    def __call__(self, x, prompt_x, x_lens, t, style, cond, drop_cond=None):
        """
        x:        (B, mel=80, T) noisy mel
        prompt_x: (B, 80, T) reference mel (zeros beyond prompt)
        x_lens:   (B,) or (1,) valid frame counts
        t:        (B,) diffusion time
        style:    (B, 192)
        cond:     (B, T, content_dim=512)
        drop_cond: optional (B,) bool — CFG class dropout for training: zeroes
            every conditioning column of the merged input past in_channels
            (prompt, projected cond incl. its bias, style), exactly the
            reference's `x_in[..., in_channels:] * 0`
            (diffusion_transformer.py:202-226). Per-sample here (the reference
            drops the whole batch on one coin flip — per-sample is the
            standard CFG-training improvement and a strict superset).
        Returns (B, 80, T) velocity.
        """
        c = self.cfg
        B, _, T = x.shape
        t1 = TimestepEmbedder(c.hidden_dim, c.time_freq_dim, name="t_embedder")(t)
        cond = nn.Dense(c.hidden_dim, name="cond_projection")(cond)
        xt = jnp.swapaxes(x, 1, 2)  # (B, T, 80)
        pt = jnp.swapaxes(prompt_x, 1, 2)
        x_in = jnp.concatenate([xt, pt, cond], axis=-1)
        if c.style_condition and not c.style_as_token:
            x_in = jnp.concatenate(
                [x_in, jnp.broadcast_to(style[:, None], (B, T, style.shape[-1]))],
                axis=-1,
            )
        if drop_cond is not None:
            keep = 1.0 - drop_cond.astype(x_in.dtype)[:, None, None]
            x_in = jnp.concatenate(
                [x_in[..., : c.in_channels], x_in[..., c.in_channels :] * keep],
                axis=-1,
            )
        x_in = nn.Dense(c.hidden_dim, name="cond_x_merge_linear")(x_in)

        # keep the stack in the caller's compute dtype: the fp32 time
        # embedding otherwise promotes every AdaLN-modulated activation —
        # and so every downstream matmul — back to fp32 (bf16 mode then
        # never engages the MXU at bf16 rate)
        t1 = t1.astype(x_in.dtype)

        valid = jnp.arange(T)[None, :] < x_lens[:, None]  # (b, T)
        attn_mask = valid[:, None, None, :]  # (b,1,1,T) broadcast over queries
        x_res = DiTTransformer(c, name="transformer")(x_in, t1[:, None], attn_mask)
        if c.long_skip_connection:
            x_res = nn.Dense(c.hidden_dim, name="skip_linear")(
                jnp.concatenate([x_res, xt], axis=-1)
            )
        # wavenet final layer
        w = self.wavenet_cfg
        h = nn.Dense(w.hidden_dim, name="conv1")(x_res)
        t2 = TimestepEmbedder(w.hidden_dim, c.time_freq_dim, name="t_embedder2")(t)
        t2 = t2.astype(h.dtype)
        mask3 = valid[..., None].astype(h.dtype)  # (b, T, 1)
        wn = WaveNet(w, name="wavenet")(h, mask3, t2[:, None])
        h = wn + nn.Dense(w.hidden_dim, name="res_projection")(x_res)
        h = FinalLayer(w.hidden_dim, name="final_layer")(h, t1)
        out = nn.Dense(c.in_channels, name="conv2")(h)  # (B, T, 80)
        return jnp.swapaxes(out, 1, 2)


class MaskedGroupNorm(nn.Module):
    """GroupNorm(num_groups=1) whose statistics run over VALID frames only,
    so a padded/bucketed buffer produces the same normalized values the
    reference gets on an exact-length tensor (length_regulator.py:52,135)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, h, mask):
        """h: (B, T, C); mask: (B, T, 1) float 0/1."""
        C = h.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        hf = h.astype(jnp.float32) * mask
        n = jnp.maximum(mask.sum(axis=(1, 2), keepdims=True) * C, 1.0)
        mean = hf.sum(axis=(1, 2), keepdims=True) / n
        var = (jnp.square(hf - mean) * mask).sum(axis=(1, 2), keepdims=True) / n
        out = (hf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out.astype(h.dtype)


class InterpolateRegulator(nn.Module):
    """length_regulator.py:28-141 (continuous input path, interpolate=True)."""

    cfg: LengthRegulatorConfig

    @nn.compact
    def __call__(self, x, ylens, out_len: int, xlens=None):
        """x: (B, S, in_channels); ylens: (B,) valid output frames; out_len:
        static output buffer width; xlens: (B,) valid INPUT frames (defaults
        to the full S). Returns (B, out_len, channels) masked beyond ylens.

        The reference interpolates exact-length tensors (src = floor(j*S/ylen),
        F.interpolate nearest, length_regulator.py:120). With bucketed buffers
        the padded widths must NOT enter that ratio, so the nearest grid is
        built per-sequence from (xlens, ylens); convs see zeros beyond ylens
        (matching SAME zero-padding of an exact tensor) and GroupNorm stats
        run over valid frames only — each row equals a standalone exact call."""
        c = self.cfg
        B, S, _ = x.shape
        x = nn.Dense(c.channels, name="content_in_proj")(x)
        if xlens is None:
            xlens = jnp.full((B,), S, jnp.int32)
        yl = jnp.maximum(ylens, 1)
        j = jnp.arange(out_len)
        src = jnp.floor(
            j[None, :] * (xlens[:, None].astype(jnp.float32) / yl[:, None])
        ).astype(jnp.int32)
        src = jnp.clip(src, 0, jnp.maximum(xlens[:, None] - 1, 0))
        h = jnp.take_along_axis(x, src[..., None], axis=1)  # (B, out_len, C)
        mask = (j[None, :] < ylens[:, None])[..., None].astype(h.dtype)
        for i in range(len(c.sampling_ratios)):
            h = nn.Conv(c.channels, kernel_size=(3,), padding="SAME", name=f"conv_{i}")(
                h * mask
            )
            h = MaskedGroupNorm(name=f"norm_{i}")(h, mask)
            h = h * jnp.tanh(jax.nn.softplus(h))  # Mish
        h = nn.Dense(c.channels, name="out_proj")(h)
        return h * mask


class GPTLayer(nn.Module):
    """gpt latent projection 1280->256->128->1024, no activations
    (commons.py:413)."""

    dims: tuple = (1280, 256, 128, 1024)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims[1:]):
            x = nn.Dense(d, name=f"linear_{i}")(x)
        return x


class S2Mel(nn.Module):
    """Container mirroring MyModel (commons.py:390-449)."""

    cfg: S2MelConfig

    def setup(self):
        self.length_regulator = InterpolateRegulator(
            self.cfg.length_regulator, name="length_regulator"
        )
        self.cfm_estimator = DiT(self.cfg.dit, self.cfg.wavenet, name="cfm_estimator")
        self.gpt_layer = GPTLayer(self.cfg.gpt_dims, name="gpt_layer")

    def regulate(self, x, ylens, out_len: int, xlens=None):
        return self.length_regulator(x, ylens, out_len, xlens)

    def project_gpt_latent(self, x):
        return self.gpt_layer(x)

    def velocity(self, x, prompt_x, x_lens, t, style, cond, drop_cond=None):
        return self.cfm_estimator(x, prompt_x, x_lens, t, style, cond, drop_cond)
