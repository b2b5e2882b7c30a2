"""GPT-2 transformer core in flax, TPU-first.

Semantics-parity target: the reference's vendored HF GPT-2
(indextts/gpt/transformers_gpt2.py — a pinned copy of transformers' GPT2Model)
as used by UnifiedVoice (gpt/model_v2.py:286-306): wte/wpe are ripped out, the
model consumes `inputs_embeds` directly, causal self-attention with additive
padding masks, gelu_new MLP, LayerNorm eps 1e-5.

TPU-first: one weight layout, two execution modes —
  * `__call__`  : full-sequence (prefill / teacher-forced latent pass), one
                  fused program, MXU-shaped [B,T,D] matmuls.
  * `decode_step`: single-token step reading/writing a static-shape KV cache
                  laid out (L, B, H, Tmax, Dh); index arithmetic stays
                  on-device so the whole AR loop lives inside one
                  `lax.while_loop` (replaces the reference accel engine's
                  per-token host bookkeeping, accel_engine.py:567-607).

Tensor-parallel sharding (parallel/sharding.py) column-shards c_attn/c_fc and
row-shards the projections over the "model" mesh axis; XLA inserts the psum.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9
# bucketed-prefix decode attention granularity (lane-aligned)
BUCKET_BK = 256


def _gemv_max_rows() -> int:
    """Row threshold for routing single-token calls through the streaming
    Pallas GEMV kernels (ops/gemv.py). Beam decode (B=3, the engine's
    reference-default route) and small batched decode are just as
    weight-streaming-bound as B=1; the crossover vs XLA's batched GEMM is
    measured on TPU and tuned here. Env: TARS_GEMV_MAX_ROWS."""
    import os

    return int(os.environ.get("TARS_GEMV_MAX_ROWS", "1"))


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """HF 'gelu_new' == tanh-approx GELU (transformers.activations.NewGELUActivation)."""
    return (
        0.5
        * x
        * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3.0))))
    )


def _quant_row(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-row int8 activation quantization (W8A8 input side)."""
    xf = x.astype(jnp.float32)
    a_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0 + 1e-12
    x_q = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    return x_q, a_scale


class Conv1D(nn.Module):
    """HF GPT-2 'Conv1D': y = x @ W + b with W stored (in, out).

    quantize=True switches to W8A8: int8 per-output-channel weights with a
    dynamic per-row activation scale; the int8xint8->int32 contraction runs on
    the MXU at double throughput and half the HBM weight traffic (the TPU
    analog of the reference's torch.ao dynamic quantization,
    utils/vram_utils.py:13-52).

    gemv=True additionally routes single-row calls (B*T == 1: the B=1 decode
    step) through the streaming Pallas GEMV (ops/gemv.py) when the dims are
    tile-aligned — same contraction, weight bytes read once at near-peak HBM
    bandwidth."""

    features: int
    quantize: bool = False
    gemv: bool = False
    pallas_interpret: bool = False
    # weight bits when quantized: 8 (W8A8) or 4 (W4A8 packed nibbles, two
    # int4 per byte — halves the weight HBM stream again; scales stay
    # per-out-channel so fidelity is coarser than W8: opt-in serving knob)
    wbits: int = 8
    # 4-bit nibble-pair axis: False = contraction rows (i, i+d/2) — the
    # gemv_w4 layout; True = output cols (j, j+f/2) — the layout mlp_w4
    # needs for its blocked second matmul (GPT2MLP's c_proj)
    w4_cols: bool = False

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if not self.quantize:
            w = self.param(
                "kernel", nn.initializers.normal(0.02), (x.shape[-1], self.features)
            )
            return jnp.matmul(x, w.astype(x.dtype)) + b.astype(x.dtype)

        d = x.shape[-1]
        if self.quantize and self.wbits == 4:
            return self._call_w4(x, b, d, return_params)

        w_q = self.param(
            "kernel_q",
            lambda k, s: jnp.zeros(s, jnp.int8),
            (x.shape[-1], self.features),
        )
        w_scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,)
        )
        if return_params:
            # fused callers (GPT2MLP's Pallas MLP) read the params directly
            return w_q, w_scale, b

        lead = 1
        for s in x.shape[:-1]:
            lead *= s
        # single-token decode rows only: T == 1 (never prefill chunks)
        single_tok = x.ndim < 3 or x.shape[-2] == 1
        if self.gemv and single_tok and lead <= _gemv_max_rows():
            from indextts_tpu.ops import gemv as gemv_ops

            if gemv_ops.supports(d, self.features):
                x_q, a_scale = _quant_row(x.reshape(lead, d))
                y = gemv_ops.gemv_w8(
                    x_q, a_scale, w_q, w_scale, b,
                    interpret=self.pallas_interpret,
                )
                return y.reshape(x.shape[:-1] + (self.features,)).astype(x.dtype)

        # dynamic per-row activation quantization
        x_q, a_scale = _quant_row(x)
        y = jax.lax.dot_general(
            x_q,
            w_q,
            (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * a_scale * w_scale[None]
        return (y + b).astype(x.dtype)

    def _call_w4(self, x, b, d, return_params):
        from indextts_tpu.ops import gemv as gemv_ops

        shape = (d, self.features // 2) if self.w4_cols else (
            d // 2, self.features
        )
        w_p = self.param(
            "kernel_q4", lambda k, s: jnp.zeros(s, jnp.int8), shape
        )
        w_scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,)
        )
        if return_params:
            return w_p, w_scale, b

        lead = 1
        for s in x.shape[:-1]:
            lead *= s
        single_tok = x.ndim < 3 or x.shape[-2] == 1
        if (
            self.gemv
            and single_tok
            and lead <= _gemv_max_rows()
            and not self.w4_cols
            and gemv_ops.supports_w4(d, self.features)
        ):
            x_q, a_scale = _quant_row(x.reshape(lead, d))
            y = gemv_ops.gemv_w4(
                x_q, a_scale, w_p, w_scale, b,
                interpret=self.pallas_interpret,
            )
            return y.reshape(x.shape[:-1] + (self.features,)).astype(x.dtype)

        # XLA fallback (prefill / tests): unpack once per call, then the
        # same int8 contraction as the W8 path
        w_q = gemv_ops.unpack_w4(w_p, axis=1 if self.w4_cols else 0)
        x_q, a_scale = _quant_row(x)
        y = jax.lax.dot_general(
            x_q,
            w_q,
            (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * a_scale * w_scale[None]
        return (y + b).astype(x.dtype)


class QuantDenseHead(nn.Module):
    """int8 (W8A8) lm-head Dense with lane-padded output columns.

    The decode-step logits head (mel_head: model_dim -> 8194) is the last
    unquantized weight stream on the hot loop (~21MB bf16 read per step).
    The vocab dim has no multiple-of-128 divisor, so the kernel is stored
    padded to the next lane multiple (8194 -> 8320) and the logits are
    sliced back to `features`; padding columns carry zero weights/bias so
    they never win sampling even before the slice.

    Same contraction semantics as Conv1D(quantize=True); single-row decode
    calls route through the streaming Pallas GEMV (ops/gemv.py) when
    `gemv=True`."""

    features: int
    gemv: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        fpad = -(-self.features // 128) * 128
        w_q = self.param(
            "kernel_q", lambda k, s: jnp.zeros(s, jnp.int8), (d, fpad)
        )
        w_scale = self.param("kernel_scale", nn.initializers.ones, (fpad,))
        b = self.param("bias", nn.initializers.zeros, (fpad,))

        lead = 1
        for s in x.shape[:-1]:
            lead *= s
        single_tok = x.ndim < 3 or x.shape[-2] == 1
        if self.gemv and single_tok and lead <= _gemv_max_rows():
            from indextts_tpu.ops import gemv as gemv_ops

            if gemv_ops.supports(d, fpad):
                x_q, a_scale = _quant_row(x.reshape(lead, d))
                y = gemv_ops.gemv_w8(
                    x_q, a_scale, w_q, w_scale, b,
                    interpret=self.pallas_interpret,
                )
                return y[:, : self.features].reshape(
                    x.shape[:-1] + (self.features,)
                )

        x_q, a_scale = _quant_row(x)
        y = jax.lax.dot_general(
            x_q,
            w_q,
            (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * a_scale * w_scale[None].astype(jnp.float32)
        return (y + b.astype(jnp.float32))[..., : self.features]


def quantize_dense_head_params(tree: dict) -> dict:
    """{kernel (d,f), bias (f,)} fp -> lane-padded int8 head params
    {kernel_q (d,fpad), kernel_scale (fpad,), bias (fpad,)}."""
    import numpy as np

    w = np.asarray(tree["kernel"], np.float32)
    d, f = w.shape
    fpad = -(-f // 128) * 128
    scale = np.abs(w).max(axis=0) / 127.0 + 1e-12
    w_q = np.clip(np.round(w / scale[None]), -127, 127).astype(np.int8)
    w_qp = np.zeros((d, fpad), np.int8)
    w_qp[:, :f] = w_q
    s_p = np.ones(fpad, np.float32)
    s_p[:f] = scale
    b_p = np.zeros(fpad, np.float32)
    b_p[:f] = np.asarray(tree["bias"], np.float32)
    return {"kernel_q": w_qp, "kernel_scale": s_p, "bias": b_p}


def quantize_conv1d_params(tree: dict) -> dict:
    """{kernel, bias} fp -> {kernel_q, kernel_scale, bias} (per-out-channel)."""
    import numpy as np

    w = np.asarray(tree["kernel"], np.float32)
    scale = np.abs(w).max(axis=0) / 127.0 + 1e-12
    w_q = np.clip(np.round(w / scale[None]), -127, 127).astype(np.int8)
    return {"kernel_q": w_q, "kernel_scale": scale.astype(np.float32),
            "bias": np.asarray(tree["bias"])}


def pack_w4(q, cols: bool = False):
    """int4 values in [-8,7] -> packed bytes, halving axis 1 (cols=True) or
    axis 0. Byte = (hi << 4) | (lo & 0xF) with lo = index i, hi = index
    i + n/2 along the packed axis (ops/gemv.py unpack_w4 inverse)."""
    import numpy as np

    q = np.asarray(q, np.int32)
    n = q.shape[1 if cols else 0]
    assert n % 2 == 0, q.shape
    lo, hi = (
        (q[:, : n // 2], q[:, n // 2 :]) if cols else (q[: n // 2], q[n // 2 :])
    )
    return ((hi << 4) | (lo & 0xF)).astype(np.int8)


def quantize_conv1d_params_w4(tree: dict, cols: bool = False) -> dict:
    """{kernel, bias} fp -> {kernel_q4, kernel_scale, bias}: symmetric int4
    per-out-channel weights packed two-per-byte (Conv1D wbits=4 layout)."""
    import numpy as np

    w = np.asarray(tree["kernel"], np.float32)
    scale = np.abs(w).max(axis=0) / 7.0 + 1e-12
    q = np.clip(np.round(w / scale[None]), -7, 7)
    return {"kernel_q4": pack_w4(q, cols=cols),
            "kernel_scale": scale.astype(np.float32),
            "bias": np.asarray(tree["bias"])}


def quantize_kv(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-vector int8 absmax quantization over the last (head_dim) axis.

    Returns (q int8 same shape, scale f32 without the last axis). Used for the
    int8 KV cache (kv_quant): decode attention reads the int8 cache directly —
    scores = (q . k_q) * k_scale[s] and ctx = (p * v_scale[s]) . v_q — so the
    dominant HBM stream (the KV cache, the B>=8 decode throughput ceiling)
    halves without materializing a dequantized copy."""
    tf = t.astype(jnp.float32)
    scale = jnp.max(jnp.abs(tf), axis=-1) / 127.0 + 1e-8
    q = jnp.clip(jnp.round(tf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def init_kv_cache_quant(
    n_layer: int, batch: int, n_head: int, max_len: int, head_dim: int
):
    """(ks, vs, ksc, vsc): int8 caches + per-(layer,row,head,token) scales."""
    shape = (n_layer, batch, n_head, max_len, head_dim)
    sshape = shape[:-1]
    return (
        jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
        jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32),
    )


class GPT2Attention(nn.Module):
    n_head: int
    dtype: Any = jnp.float32
    quantize: bool = False
    attn_impl: str = "xla"  # "xla" | "xla_bucketed" | "pallas_ragged" (decode)
    kv_quant: bool = False  # int8 KV cache (decode only)
    gemv: bool = False  # Pallas streaming GEMV for B=1 decode (ops/gemv.py)
    wbits: int = 8  # quantized weight bits (Conv1D wbits)
    pallas_interpret: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_bias: jnp.ndarray,
        kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        """
        x: (B, T, D). attn_bias: additive mask broadcastable to (B, 1, T, S).
        kv_cache: optional (k, v) each (B, H, Tmax, Dh); when given, this is a
        decode step: T is the new-token count, keys/values are scattered into
        the cache at cache_index and attention runs over the full cache.
        Returns (out, new_kv or (k, v) of this call).
        """
        B, T, D = x.shape
        H = self.n_head
        Dh = D // H

        qkv = Conv1D(3 * D, quantize=self.quantize, gemv=self.gemv,
             wbits=self.wbits,
             pallas_interpret=self.pallas_interpret, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, -1, H, Dh).transpose(0, 2, 1, 3)  # (B,H,T,Dh)

        q, k, v = heads(q), heads(k), heads(v)

        if kv_cache is not None and self.attn_impl == "pallas_ragged":
            # transposed caches (L, B, H, Dh, cap); attention via the ragged
            # Pallas kernel over the valid prefix only (ops/decode_attention)
            from indextts_tpu.ops.decode_attention import ragged_decode_attention_t

            ck, cv, layer_idx, valid_len, hole_s, hole_e, interp = kv_cache
            kT = k.transpose(0, 1, 3, 2)  # (B, H, Dh, T=1)
            vT = v.transpose(0, 1, 3, 2)
            ck = jax.lax.dynamic_update_slice(
                ck, kT.astype(ck.dtype)[None], (layer_idx, 0, 0, 0, cache_index)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, vT.astype(cv.dtype)[None], (layer_idx, 0, 0, 0, cache_index)
            )
            ctx = ragged_decode_attention_t(
                q[:, :, 0, :].astype(jnp.float32),
                ck[layer_idx], cv[layer_idx],
                valid_len, hole_start=hole_s, hole_end=hole_e,
                interpret=interp,
            )  # (B, H, Dh)
            ctx = ctx.astype(x.dtype).reshape(B, 1, D)
            out = Conv1D(D, quantize=self.quantize, gemv=self.gemv,
                     wbits=self.wbits,
                     pallas_interpret=self.pallas_interpret, name="c_proj")(ctx)
            return out, (ck, cv)

        if kv_cache is not None and self.attn_impl == "pallas_q8":
            # int8 block-major caches + the fused-dequant Pallas kernel
            # (ops/decode_attention.py _kernel_blocked_q8): one DMA per token
            # block fetches every head's int8 K (or V) + scales; the cache is
            # read once as int8 — XLA's quant path materializes a dequantized
            # copy and reads it twice (both attention einsums).
            from indextts_tpu.ops.decode_attention import (
                ragged_decode_attention_blocked_q8,
            )

            (k8_b, v8_b, ksc_b, vsc_b, layer_idx, valid_len, hole_s, hole_e,
             interp) = kv_cache
            assert T == 1, "pallas_q8 is a single-token decode path"
            blkq = k8_b.shape[-1]
            kq, k_sc = quantize_kv(k)  # (B,H,1,Dh) int8, (B,H,1) f32
            vq, v_sc = quantize_kv(v)
            blk_i = cache_index // blkq
            off = cache_index % blkq
            k8_b = jax.lax.dynamic_update_slice(
                k8_b, kq.transpose(0, 1, 3, 2)[None, :, None],
                (layer_idx, 0, blk_i, 0, 0, off),
            )
            v8_b = jax.lax.dynamic_update_slice(
                v8_b, vq.transpose(0, 1, 3, 2)[None, :, None],
                (layer_idx, 0, blk_i, 0, 0, off),
            )
            ksc_b = jax.lax.dynamic_update_slice(
                ksc_b, k_sc[None, :, None], (layer_idx, 0, blk_i, 0, off)
            )
            vsc_b = jax.lax.dynamic_update_slice(
                vsc_b, v_sc[None, :, None], (layer_idx, 0, blk_i, 0, off)
            )
            ctx = ragged_decode_attention_blocked_q8(
                q[:, :, 0, :].astype(jnp.float32),
                k8_b[layer_idx], v8_b[layer_idx],
                ksc_b[layer_idx], vsc_b[layer_idx],
                valid_len, hole_start=hole_s, hole_end=hole_e,
                interpret=interp,
            )  # (B, H, Dh) f32
            ctx = ctx.astype(x.dtype).reshape(B, 1, D)
            out = Conv1D(D, quantize=self.quantize, gemv=self.gemv,
                     wbits=self.wbits,
                     pallas_interpret=self.pallas_interpret, name="c_proj")(ctx)
            return out, (k8_b, v8_b, ksc_b, vsc_b)

        if kv_cache is not None and self.kv_quant:
            # int8 KV cache: kv_cache = (ck, cv int8 (L,B,H,cap,Dh), ksc, vsc
            # f32 (L,B,H,cap), layer_idx[, prefix_limit]). Both attention
            # matmuls read the int8 cache directly; the per-token scales fold
            # into the scores (k) and the probs (v), so the cache's HBM
            # stream — the decode throughput ceiling at B>=8 — halves vs
            # bf16. A STATIC prefix_limit additionally bounds the read to the
            # first prefix_limit positions (phased decode: the caller
            # guarantees every valid position is below it), making the read
            # prefix-proportional instead of full-cap.
            ck, cv, ksc, vsc, layer_idx, *extra_q = kv_cache
            kq, k_sc = quantize_kv(k)  # (B,H,T,Dh) int8, (B,H,T) f32
            vq, v_sc = quantize_kv(v)
            if getattr(cache_index, "ndim", 0) == 1:
                bidx = jnp.arange(B)
                ck = ck.at[layer_idx, bidx, :, cache_index, :].set(kq[:, :, 0, :])
                cv = cv.at[layer_idx, bidx, :, cache_index, :].set(vq[:, :, 0, :])
                ksc = ksc.at[layer_idx, bidx, :, cache_index].set(k_sc[:, :, 0])
                vsc = vsc.at[layer_idx, bidx, :, cache_index].set(v_sc[:, :, 0])
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, kq[None], (layer_idx, 0, 0, cache_index, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, vq[None], (layer_idx, 0, 0, cache_index, 0)
                )
                ksc = jax.lax.dynamic_update_slice(
                    ksc, k_sc[None], (layer_idx, 0, 0, cache_index)
                )
                vsc = jax.lax.dynamic_update_slice(
                    vsc, v_sc[None], (layer_idx, 0, 0, cache_index)
                )
            k8, v8 = ck[layer_idx], cv[layer_idx]          # (B,H,cap,Dh) int8
            ksc_l, vsc_l = ksc[layer_idx], vsc[layer_idx]  # (B,H,cap) f32
            if extra_q and isinstance(extra_q[0], int):
                lim = extra_q[0]
                k8 = jax.lax.slice_in_dim(k8, 0, lim, axis=2)
                v8 = jax.lax.slice_in_dim(v8, 0, lim, axis=2)
                ksc_l = jax.lax.slice_in_dim(ksc_l, 0, lim, axis=2)
                vsc_l = jax.lax.slice_in_dim(vsc_l, 0, lim, axis=2)
                attn_bias = jax.lax.slice_in_dim(attn_bias, 0, lim, axis=3)
            scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
            raw = jnp.einsum("bhtd,bhsd->bhts", q, k8.astype(q.dtype))
            scores = raw.astype(jnp.float32) * scale * ksc_l[:, :, None, :]
            scores = scores + attn_bias
            probs = jax.nn.softmax(scores, axis=-1)
            pv = (probs * vsc_l[:, :, None, :]).astype(x.dtype)
            ctx = jnp.einsum("bhts,bhsd->bhtd", pv, v8.astype(x.dtype))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
            out = Conv1D(D, quantize=self.quantize, gemv=self.gemv,
                     wbits=self.wbits,
                     pallas_interpret=self.pallas_interpret, name="c_proj")(ctx)
            return out, (ck, cv, ksc, vsc)

        if kv_cache is not None:
            # kv_cache = full stacked caches (L, B, H, Tmax, Dh); write this
            # step's k/v at (layer_idx, :, :, cache_index) IN PLACE — never
            # rebuild the stack (that would copy the whole cache every step)
            ck, cv, layer_idx, *extra = kv_cache
            if getattr(cache_index, "ndim", 0) == 1:
                # per-row write positions (continuous batching: slots decode
                # at different depths); scatter touches only B*H*Dh elements
                bidx = jnp.arange(B)
                ck = ck.at[layer_idx, bidx, :, cache_index, :].set(
                    k[:, :, 0, :].astype(ck.dtype)
                )
                cv = cv.at[layer_idx, bidx, :, cache_index, :].set(
                    v[:, :, 0, :].astype(cv.dtype)
                )
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, k.astype(ck.dtype)[None], (layer_idx, 0, 0, cache_index, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, v.astype(cv.dtype)[None], (layer_idx, 0, 0, cache_index, 0)
                )
            k, v = ck[layer_idx], cv[layer_idx]
            new_kv = (ck, cv)
            if extra:
                # bucketed-prefix decode attention: attend only over a static
                # prefix of the cache. Exactly equal to full-cap attention
                # (excluded positions carry NEG_INF bias -> exact softmax
                # zeros); HBM decode traffic is the throughput ceiling at
                # B>=8 — the TPU counterpart of the reference's paged flash
                # decode (accel/attention.py:129-153).
                #
                # The switch is PER LAYER and wraps only the ctx computation:
                # the cache update stays outside, so only (B,T,D)-sized
                # values cross the conditional. Wrapping the whole layer
                # stack in one switch was measured 2.3x SLOWER at cap 1664
                # (XLA conditionals copy the loop-carried caches at the
                # branch boundary).
                (lim,) = extra
                if isinstance(lim, int):
                    # static prefix (tests / known-bound callers)
                    k = jax.lax.slice_in_dim(k, 0, lim, axis=2)
                    v = jax.lax.slice_in_dim(v, 0, lim, axis=2)
                    attn_bias = jax.lax.slice_in_dim(attn_bias, 0, lim, axis=3)
                else:
                    cap = k.shape[2]
                    BK = BUCKET_BK
                    nbr = -(-cap // BK)
                    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))

                    def mk(m):
                        S_m = min((m + 1) * BK, cap)

                        def br(q, k, v, bias):
                            ks_ = jax.lax.slice_in_dim(k, 0, S_m, axis=2)
                            vs_ = jax.lax.slice_in_dim(v, 0, S_m, axis=2)
                            bs_ = jax.lax.slice_in_dim(bias, 0, S_m, axis=3)
                            s = (
                                jnp.einsum("bhtd,bhsd->bhts", q, ks_).astype(
                                    jnp.float32
                                )
                                * scale
                                + bs_
                            )
                            p = jax.nn.softmax(s, axis=-1).astype(vs_.dtype)
                            return jnp.einsum("bhts,bhsd->bhtd", p, vs_)

                        return br

                    ctx = jax.lax.switch(
                        lim, [mk(m) for m in range(nbr)], q, k, v, attn_bias
                    )
                    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
                    out = Conv1D(D, quantize=self.quantize, gemv=self.gemv,
                     wbits=self.wbits,
                     pallas_interpret=self.pallas_interpret, name="c_proj")(ctx)
                    return out, new_kv
        else:
            new_kv = (k, v)

        scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, dtype=jnp.float32))
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) * scale
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = Conv1D(D, quantize=self.quantize, gemv=self.gemv,
                     wbits=self.wbits,
                     pallas_interpret=self.pallas_interpret, name="c_proj")(ctx)
        return out, new_kv


class GPT2MLP(nn.Module):
    dtype: Any = jnp.float32
    quantize: bool = False
    gemv: bool = False
    wbits: int = 8
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        w4 = self.quantize and self.wbits == 4
        fc = Conv1D(4 * D, quantize=self.quantize, wbits=self.wbits,
                    name="c_fc")
        # under w4, c_proj packs nibble pairs along its OUTPUT columns so the
        # fused kernel's blocked FH contraction reads contiguous block rows
        pj = Conv1D(D, quantize=self.quantize, gemv=self.gemv,
                     wbits=self.wbits, w4_cols=w4,
                     pallas_interpret=self.pallas_interpret, name="c_proj")
        lead = 1
        for s in x.shape[:-1]:
            lead *= s
        single_tok = x.ndim < 3 or x.shape[-2] == 1
        if (self.quantize and self.gemv and single_tok
                and lead <= _gemv_max_rows()):
            from indextts_tpu.ops import gemv as gemv_ops

            supported = (
                gemv_ops.supports_mlp_w4(D, 4 * D)
                if w4
                else gemv_ops.supports_mlp(D, 4 * D)
            )
            if supported:
                # fused fc -> gelu_new -> c_proj in one Pallas kernel: both
                # weight matrices stream through VMEM exactly once (the MLP
                # is 2/3 of the decode step's weight bytes). The dummy-zeros
                # arg only sets c_proj's in_features; XLA DCEs it.
                w1, s1, b1 = fc(x, return_params=True)
                w2, s2, b2 = pj(
                    jnp.zeros((1, 1, 4 * D), x.dtype), return_params=True
                )
                x_q, a_scale = _quant_row(x.reshape(lead, D))
                mlp_fn = gemv_ops.mlp_w4 if w4 else gemv_ops.mlp_w8
                y = mlp_fn(
                    x_q, a_scale, w1, s1, b1, w2, s2, b2,
                    interpret=self.pallas_interpret,
                )
                return y.reshape(x.shape).astype(x.dtype)
        h = fc(x)
        h = gelu_new(h)
        return pj(h)


class GPT2Block(nn.Module):
    n_head: int
    dtype: Any = jnp.float32
    quantize: bool = False
    attn_impl: str = "xla"
    kv_quant: bool = False
    gemv: bool = False
    wbits: int = 8
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x, attn_bias, kv_cache=None, cache_index=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1", dtype=self.dtype)(x)
        attn_out, new_kv = GPT2Attention(
            self.n_head, self.dtype, self.quantize, self.attn_impl,
            self.kv_quant, gemv=self.gemv, wbits=self.wbits,
            pallas_interpret=self.pallas_interpret, name="attn"
        )(h, attn_bias, kv_cache, cache_index)
        x = x + attn_out
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2", dtype=self.dtype)(x)
        x = x + GPT2MLP(self.dtype, self.quantize, gemv=self.gemv,
                        wbits=self.wbits,
                        pallas_interpret=self.pallas_interpret,
                        name="mlp")(h)
        return x, new_kv


class GPT2Core(nn.Module):
    """Stack of GPT-2 blocks + final LayerNorm. Consumes embeddings only
    (the reference deletes wte/wpe: model_v2.py:300-304)."""

    n_layer: int
    n_head: int
    dtype: Any = jnp.float32
    quantize: bool = False
    attn_impl: str = "xla"
    # interpret-mode for the pallas kernel (CPU tests)
    pallas_interpret: bool = False
    # int8 KV cache for decode (kv_caches = (ks, vs, ksc, vsc))
    kv_quant: bool = False
    # "pallas": route B=1 decode GEMVs/MLP through ops/gemv.py kernels
    gemv_impl: str = "xla"
    # quantized weight bits: 8 (W8A8) or 4 (W4A8 packed nibbles)
    wbits: int = 8

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        kv_caches: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        kv_valid_len: Optional[jnp.ndarray] = None,
        prefix_limit: Optional[int] = None,
    ):
        """
        inputs_embeds: (B, T, D)
        attention_mask: (B, S) 1/0 padding mask over the key axis; in decode
          mode S == Tmax of the cache, in prefill S == T.
        kv_caches: optional stacked caches (L, B, H, Tmax, Dh) x2 for decode.
        cache_index: scalar write position for decode, or (B,) per-row
          positions (continuous batching).
        prefix_limit: STATIC bound — decode attention reads only the first
          prefix_limit cache tokens (bucketed-prefix attention; the caller
          guarantees every valid position is below it).
        Returns (hidden, new_kv_caches_or_None).
        """
        B, T, D = inputs_embeds.shape
        x = inputs_embeds.astype(self.dtype)

        if kv_caches is None:
            # prefill: causal + optional padding
            causal = jnp.tril(jnp.ones((T, T), dtype=bool))
            bias = jnp.where(causal[None, None], 0.0, NEG_INF)
            if attention_mask is not None:
                pad = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
                bias = bias + pad
            new_ks, new_vs = [], []
            for i in range(self.n_layer):
                x, (k, v) = GPT2Block(
                    self.n_head, self.dtype, self.quantize,
                    gemv=self.gemv_impl == "pallas", wbits=self.wbits,
                    pallas_interpret=self.pallas_interpret, name=f"h_{i}"
                )(x, bias)
                new_ks.append(k)
                new_vs.append(v)
            new_kv = (jnp.stack(new_ks), jnp.stack(new_vs))
        elif self.attn_impl == "pallas_ragged":
            # decode via the ragged Pallas kernel: caches are (L,B,H,Dh,cap);
            # the left-pad run inside the prompt becomes a contiguous masked
            # hole derived from the attention mask
            ks, vs = kv_caches
            if attention_mask is not None:
                inval = ~attention_mask.astype(bool)
                hole_s = jnp.argmax(inval, axis=1).astype(jnp.int32)
                hole_e = hole_s + jnp.sum(inval, axis=1).astype(jnp.int32)
            else:
                hole_s = jnp.zeros((B,), jnp.int32)
                hole_e = jnp.zeros((B,), jnp.int32)
            for i in range(self.n_layer):
                x, (ks, vs) = GPT2Block(
                    self.n_head, self.dtype, self.quantize, self.attn_impl,
                    gemv=self.gemv_impl == "pallas", wbits=self.wbits,
                    pallas_interpret=self.pallas_interpret,
                    name=f"h_{i}",
                )(
                    x, None,
                    kv_cache=(ks, vs, i, kv_valid_len, hole_s, hole_e,
                              self.pallas_interpret),
                    cache_index=cache_index,
                )
            new_kv = (ks, vs)
        elif (self.attn_impl == "pallas_q8" and len(tuple(kv_caches)) == 4
              and kv_caches[0].ndim == 6):
            # int8 block-major decode via the fused-dequant Pallas kernel:
            # caches (L,B,NB,H,Dh,blk) int8 x2 + (L,B,NB,H,blk) f32 scales x2
            k8_b, v8_b, ksc_b, vsc_b = kv_caches
            if attention_mask is not None:
                inval = ~attention_mask.astype(bool)
                hole_s = jnp.argmax(inval, axis=1).astype(jnp.int32)
                hole_e = hole_s + jnp.sum(inval, axis=1).astype(jnp.int32)
            else:
                hole_s = jnp.zeros((B,), jnp.int32)
                hole_e = jnp.zeros((B,), jnp.int32)
            caches = (k8_b, v8_b, ksc_b, vsc_b)
            for i in range(self.n_layer):
                x, caches = GPT2Block(
                    self.n_head, self.dtype, self.quantize, self.attn_impl,
                    gemv=self.gemv_impl == "pallas", wbits=self.wbits,
                    pallas_interpret=self.pallas_interpret,
                    name=f"h_{i}",
                )(
                    x, None,
                    kv_cache=caches + (i, kv_valid_len, hole_s, hole_e,
                                       self.pallas_interpret),
                    cache_index=cache_index,
                )
            new_kv = caches
        else:
            # decode: attend to cache positions < kv_valid_len (+ current).
            # T > 1 is a chunked continuation prefill (prefix-KV reuse): query
            # t of the chunk sees keys < kv_valid_len - (T-1-t), i.e. causal
            # within the chunk, everything before it unconditionally.
            caches = tuple(kv_caches)  # (ks, vs) or (ks, vs, ksc, vsc)
            ks = caches[0]
            # route by cache arity: a kv_quant model still serves float-cache
            # callers (beam search, continuous batching) through the float
            # path — only the 4-tuple int8 cache takes the quant branch
            if self.kv_quant and len(caches) == 4:
                assert self.attn_impl == "xla", (
                    "kv_quant requires attn_impl='xla'"
                )
                Tmax = ks.shape[3]
                pos = jnp.arange(Tmax)
                thr = kv_valid_len[:, None] - (T - 1) + jnp.arange(T)[None, :]
                valid = pos[None, None, :] < thr[:, :, None]
                if attention_mask is not None:
                    valid = jnp.logical_and(
                        valid, attention_mask.astype(bool)[:, None, :]
                    )
                bias = jnp.where(valid[:, None], 0.0, NEG_INF)
                extra_q = (prefix_limit,) if prefix_limit is not None else ()
                for i in range(self.n_layer):
                    x, caches = GPT2Block(
                        self.n_head, self.dtype, self.quantize,
                        self.attn_impl, kv_quant=True,
                        gemv=self.gemv_impl == "pallas", wbits=self.wbits,
                        pallas_interpret=self.pallas_interpret,
                        name=f"h_{i}",
                    )(x, bias, kv_cache=caches + (i,) + extra_q,
                      cache_index=cache_index)
                x = nn.LayerNorm(epsilon=1e-5, name="ln_f",
                                 dtype=self.dtype)(x)
                return x, caches
            ks, vs = caches
            Tmax = ks.shape[3]
            pos = jnp.arange(Tmax)
            thr = kv_valid_len[:, None] - (T - 1) + jnp.arange(T)[None, :]
            valid = pos[None, None, :] < thr[:, :, None]  # (B, T, Tmax)
            if attention_mask is not None:
                valid = jnp.logical_and(
                    valid, attention_mask.astype(bool)[:, None, :]
                )
            bias = jnp.where(valid[:, None], 0.0, NEG_INF)
            if prefix_limit is not None:
                extra = (prefix_limit,)
            elif self.attn_impl == "xla_bucketed" and T == 1:
                nbr = -(-Tmax // BUCKET_BK)
                n = jnp.max(kv_valid_len)
                extra = (
                    jnp.clip((n + BUCKET_BK - 1) // BUCKET_BK - 1, 0, nbr - 1),
                ) if nbr > 1 else ()
            else:
                extra = ()
            # a pallas_q8 model still serves float-cache callers (beam
            # search) through the plain XLA decode attention
            impl = "xla" if self.attn_impl == "pallas_q8" else self.attn_impl
            for i in range(self.n_layer):
                x, (ks, vs) = GPT2Block(
                    self.n_head, self.dtype, self.quantize, impl,
                    gemv=self.gemv_impl == "pallas", wbits=self.wbits,
                    pallas_interpret=self.pallas_interpret,
                    name=f"h_{i}",
                )(x, bias, kv_cache=(ks, vs, i) + extra, cache_index=cache_index)
            new_kv = (ks, vs)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_f", dtype=self.dtype)(x)
        return x, new_kv


def init_kv_cache(
    n_layer: int, batch: int, n_head: int, max_len: int, head_dim: int, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shape = (n_layer, batch, n_head, max_len, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
