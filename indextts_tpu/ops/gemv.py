"""Streaming int8 GEMV Pallas kernels for the B=1 autoregressive decode step.

Why: the B=1 decode step is pure HBM weight streaming (the MXU is >99% idle
at one token), and XLA's W8A8 GEMVs run at ~60% of the v5e HBM roofline
(measured 9.7/3.4/23.6 us/layer for qkv/proj/mlp vs 6/2/16 us rooflines —
see ARCHITECTURE.md perf notes). These kernels stream the int8 weight tiles
through VMEM with the grid pipeline (double-buffered DMA) and do the
dequant-scale epilogue in-register, so each weight byte is read exactly once
at near-peak bandwidth.

This is the TPU counterpart of the reference accel engine's fused GEMV path
(the reference leans on torch.compile + cuBLAS GEMV for its decode MLPs,
indextts/accel/model_v2.py); on TPU the win comes from owning the weight
DMA schedule rather than trusting XLA's generic fusion.

Semantics: identical contraction to models/gpt2.py Conv1D's quantize branch
(int8 x int8 -> int32 on the MXU, per-output-channel weight scales, dynamic
per-row activation scale computed by the caller). The fused MLP kernel
quantizes the hidden activation per BLOCK (finer than the XLA path's
per-row absmax), so its output differs from the XLA W8A8 path within
quantization granularity — both approximate the same float op; the
per-block variant is strictly finer-grained.

Alignment: requires in_features % 32 == 0 (int8 sublane tile) and an
out_features block that is a multiple of 128 (lanes). `supports()` gates
dispatch; callers fall back to the XLA path for tiny/test dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# target ~512KB weight tiles: big enough to amortize DMA setup, small enough
# that double-buffering two operand streams stays well inside scoped VMEM
_TARGET_TILE_BYTES = 512 * 1024
# the w4 kernels unpack each packed tile into int32/int8 intermediates in
# VMEM (~6x the packed bytes live at once), so their tiles target 256KB
_TARGET_TILE_BYTES_W4 = 256 * 1024


def _pick_block(
    d: int, f: int, max_blk: int = 1536, target: int = _TARGET_TILE_BYTES
) -> int:
    """Largest multiple-of-128 divisor of f with tile bytes closest to the
    byte target. Returns 0 if f has no multiple-of-128 divisor."""
    best, best_cost = 0, None
    blk = 128
    while blk <= min(f, max_blk):
        if f % blk == 0:
            cost = abs(d * blk - target)
            if best_cost is None or cost < best_cost:
                best, best_cost = blk, cost
        blk += 128
    return best


def supports(d: int, f: int) -> bool:
    """Can gemv_w8 run on (d, f)? (int8 tiling + blockable out dim)."""
    return d % 32 == 0 and d >= 128 and _pick_block(d, f) > 0


def supports_w4(d: int, f: int) -> bool:
    """Can gemv_w4 run on (d, f)? The packed weight holds rows (i, i+d/2) in
    one byte, so the contraction halves need d % 64 == 0 (int8 sublanes)."""
    return (
        d % 64 == 0
        and d >= 256
        and _pick_block(d // 2, f, target=_TARGET_TILE_BYTES_W4) > 0
    )


def unpack_w4(wp: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Packed nibbles -> int8 in [-8, 7], doubling `axis`.

    Byte layout (see models/gpt2.py pack_w4): low nibble = index i along
    `axis`, high nibble = index i + n/2, both signed. Shared by the Pallas
    kernels (per VMEM tile, axis=0) and the XLA fallback path (whole
    tensor; axis=1 for the cols-packed MLP c_proj)."""
    w32 = wp.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w32, 28), 28
    ).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(w32, 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=axis)


def supports_mlp(d: int, fh: int) -> bool:
    return (
        d % 128 == 0
        and d >= 128
        and fh % 32 == 0
        and _pick_block(d, fh) > 0
    )


def supports_mlp_w4(d: int, fh: int) -> bool:
    """fc is packed along the D contraction (needs d % 64 == 0); fc2 along
    its D output columns (lane dim d/2 must be a multiple of 128)."""
    return (
        d % 256 == 0
        and d >= 256
        and fh % 64 == 0
        and _pick_block(d // 2, fh, target=_TARGET_TILE_BYTES_W4) > 0
    )


# ---------------------------------------------------------------------------
# y(1,F) = (xq(1,D) . w(D,F)) * (a * s) + b
# ---------------------------------------------------------------------------


def _gemv_kernel(xq_ref, a_ref, w_ref, s_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    a = a_ref[:][:, :1]  # (b, 1) from the lane-replicated (b, 128) block
    o_ref[:] = acc * (a * s_ref[:]) + b_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gemv_w8(
    xq: jnp.ndarray,  # (b, D) int8 — b small (decode rows: 1..16)
    a: jnp.ndarray,  # (b,) / (b, 1) f32 per-row activation scales
    w_q: jnp.ndarray,  # (D, F) int8
    w_scale: jnp.ndarray,  # (F,) f32
    bias: jnp.ndarray,  # (F,) f32
    *,
    interpret: bool = False,
) -> jnp.ndarray:  # (b, F) f32
    b, d = xq.shape
    f = w_q.shape[1]
    fb = _pick_block(d, f)
    assert fb > 0, (d, f)
    a_rep = jnp.broadcast_to(
        a.reshape(b, 1).astype(jnp.float32), (b, 128)
    )
    return pl.pallas_call(
        _gemv_kernel,
        grid=(f // fb,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((b, 128), lambda i: (0, 0)),
            pl.BlockSpec((d, fb), lambda i: (0, i)),
            pl.BlockSpec((1, fb), lambda i: (0, i)),
            pl.BlockSpec((1, fb), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b, fb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, f), jnp.float32),
        interpret=interpret,
    )(
        xq,
        a_rep,
        w_q,
        w_scale.astype(jnp.float32).reshape(1, f),
        bias.astype(jnp.float32).reshape(1, f),
    )


# ---------------------------------------------------------------------------
# W4A8: y(1,F) = (xq(1,D) . unpack(wp(D/2,F))) * (a * s) + b
# ---------------------------------------------------------------------------


def _gemv4_kernel(xq_ref, a_ref, wp_ref, s_ref, b_ref, o_ref):
    w32 = wp_ref[:].astype(jnp.int32)  # (d2, fb) packed nibbles
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w32, 28), 28
    ).astype(jnp.int8)
    hi = jax.lax.shift_right_arithmetic(w32, 4).astype(jnp.int8)
    d2 = wp_ref.shape[0]
    x = xq_ref[:]
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc = (dot(x[:, :d2], lo) + dot(x[:, d2:], hi)).astype(jnp.float32)
    a = a_ref[:][:, :1]
    o_ref[:] = acc * (a * s_ref[:]) + b_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gemv_w4(
    xq: jnp.ndarray,  # (b, D) int8 — b small (decode rows)
    a: jnp.ndarray,  # (b,) / (b, 1) f32 per-row activation scales
    w_p: jnp.ndarray,  # (D/2, F) int8 packed nibbles (pack_w4 layout)
    w_scale: jnp.ndarray,  # (F,) f32
    bias: jnp.ndarray,  # (F,) f32
    *,
    interpret: bool = False,
) -> jnp.ndarray:  # (b, F) f32
    b, d = xq.shape
    d2, f = w_p.shape
    assert d == 2 * d2, (d, d2)
    fb = _pick_block(d2, f, target=_TARGET_TILE_BYTES_W4)
    assert fb > 0, (d, f)
    a_rep = jnp.broadcast_to(a.reshape(b, 1).astype(jnp.float32), (b, 128))
    return pl.pallas_call(
        _gemv4_kernel,
        grid=(f // fb,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((b, 128), lambda i: (0, 0)),
            pl.BlockSpec((d2, fb), lambda i: (0, i)),
            pl.BlockSpec((1, fb), lambda i: (0, i)),
            pl.BlockSpec((1, fb), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b, fb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, f), jnp.float32),
        interpret=interpret,
    )(
        xq,
        a_rep,
        w_p,
        w_scale.astype(jnp.float32).reshape(1, f),
        bias.astype(jnp.float32).reshape(1, f),
    )


# ---------------------------------------------------------------------------
# fused MLP: out(1,D) = q8(gelu_new(xq @ fc * (a*s1) + b1)) @ fc2 * s2 + b2
# ---------------------------------------------------------------------------


def _mlp_kernel(xq_ref, a_ref, fc_ref, s1_ref, b1_ref, fc2_ref, s2_ref,
                b2_ref, o_ref):
    i = pl.program_id(0)
    h = jax.lax.dot_general(
        xq_ref[:],
        fc_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    h = h * (a_ref[:][:, :1] * s1_ref[:]) + b1_ref[:]
    # gelu_new (models/gpt2.py): tanh-approx, computed in f32
    h = 0.5 * h * (
        1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h))
    )
    # per-block activation quantization (finer than per-row; both bound the
    # same float op — see module docstring)
    ha = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0 + 1e-12
    hq = jnp.clip(jnp.round(h / ha), -127, 127).astype(jnp.int8)
    part = jax.lax.dot_general(
        hq,
        fc2_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (ha * s2_ref[:])

    @pl.when(i == 0)
    def _():
        o_ref[:] = part + b2_ref[:]

    @pl.when(i > 0)
    def _():
        o_ref[:] = o_ref[:] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_w8(
    xq: jnp.ndarray,  # (b, D) int8 — b small (decode rows: 1..16)
    a: jnp.ndarray,  # (b,) / (b, 1) f32 per-row activation scales
    fc_q: jnp.ndarray,  # (D, FH) int8
    fc_scale: jnp.ndarray,  # (FH,)
    fc_bias: jnp.ndarray,  # (FH,)
    fc2_q: jnp.ndarray,  # (FH, D) int8
    fc2_scale: jnp.ndarray,  # (D,)
    fc2_bias: jnp.ndarray,  # (D,)
    *,
    interpret: bool = False,
) -> jnp.ndarray:  # (b, D) f32
    b, _ = xq.shape
    d, fh = fc_q.shape
    hb = _pick_block(d, fh)
    assert hb > 0 and hb % 32 == 0, (d, fh)
    a_rep = jnp.broadcast_to(
        a.reshape(b, 1).astype(jnp.float32), (b, 128)
    )
    return pl.pallas_call(
        _mlp_kernel,
        grid=(fh // hb,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((b, 128), lambda i: (0, 0)),
            pl.BlockSpec((d, hb), lambda i: (0, i)),
            pl.BlockSpec((1, hb), lambda i: (0, i)),
            pl.BlockSpec((1, hb), lambda i: (0, i)),
            pl.BlockSpec((hb, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=interpret,
    )(
        xq,
        a_rep,
        fc_q,
        fc_scale.astype(jnp.float32).reshape(1, fh),
        fc_bias.astype(jnp.float32).reshape(1, fh),
        fc2_q,
        fc2_scale.astype(jnp.float32).reshape(1, d),
        fc2_bias.astype(jnp.float32).reshape(1, d),
    )


# ---------------------------------------------------------------------------
# W4A8 fused MLP: both weight matrices stream packed (half the HBM bytes of
# the W8 variant). fc is packed along the D contraction rows (byte = rows
# (i, i+D/2) — full contraction per tile); fc2 is packed along its OUTPUT
# columns (byte = cols (j, j+D/2)) so the blocked FH contraction stays a
# contiguous block row-range.
# ---------------------------------------------------------------------------


def _mlp4_kernel(xq_ref, a_ref, fcp_ref, s1_ref, b1_ref, fc2p_ref, s2_ref,
                 b2_ref, o_ref):
    i = pl.program_id(0)

    def unpack(w32):
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w32, 28), 28
        ).astype(jnp.int8)
        hi = jax.lax.shift_right_arithmetic(w32, 4).astype(jnp.int8)
        return lo, hi

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    lo1, hi1 = unpack(fcp_ref[:].astype(jnp.int32))  # (d2, hb) each
    d2 = fcp_ref.shape[0]
    x = xq_ref[:]
    h = (dot(x[:, :d2], lo1) + dot(x[:, d2:], hi1)).astype(jnp.float32)
    h = h * (a_ref[:][:, :1] * s1_ref[:]) + b1_ref[:]
    # gelu_new (models/gpt2.py): tanh-approx, computed in f32
    h = 0.5 * h * (
        1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h))
    )
    # per-block activation quantization (same granularity note as _mlp_kernel)
    ha = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0 + 1e-12
    hq = jnp.clip(jnp.round(h / ha), -127, 127).astype(jnp.int8)

    lo2, hi2 = unpack(fc2p_ref[:].astype(jnp.int32))  # (hb, d2) each
    part = jnp.concatenate(
        [dot(hq, lo2), dot(hq, hi2)], axis=1
    ).astype(jnp.float32) * (ha * s2_ref[:])

    @pl.when(i == 0)
    def _():
        o_ref[:] = part + b2_ref[:]

    @pl.when(i > 0)
    def _():
        o_ref[:] = o_ref[:] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_w4(
    xq: jnp.ndarray,  # (b, D) int8
    a: jnp.ndarray,  # (b,) / (b, 1) f32 per-row activation scales
    fc_p: jnp.ndarray,  # (D/2, FH) int8 packed rows (pack_w4)
    fc_scale: jnp.ndarray,  # (FH,)
    fc_bias: jnp.ndarray,  # (FH,)
    fc2_p: jnp.ndarray,  # (FH, D/2) int8 packed cols (pack_w4 on kernel.T)
    fc2_scale: jnp.ndarray,  # (D,)
    fc2_bias: jnp.ndarray,  # (D,)
    *,
    interpret: bool = False,
) -> jnp.ndarray:  # (b, D) f32
    b, d = xq.shape
    d2, fh = fc_p.shape
    assert d == 2 * d2, (d, d2)
    hb = _pick_block(d2, fh, target=_TARGET_TILE_BYTES_W4)
    assert hb > 0 and hb % 32 == 0, (d, fh)
    a_rep = jnp.broadcast_to(a.reshape(b, 1).astype(jnp.float32), (b, 128))
    return pl.pallas_call(
        _mlp4_kernel,
        grid=(fh // hb,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0)),
            pl.BlockSpec((b, 128), lambda i: (0, 0)),
            pl.BlockSpec((d2, hb), lambda i: (0, i)),
            pl.BlockSpec((1, hb), lambda i: (0, i)),
            pl.BlockSpec((1, hb), lambda i: (0, i)),
            pl.BlockSpec((hb, d2), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=interpret,
    )(
        xq,
        a_rep,
        fc_p,
        fc_scale.astype(jnp.float32).reshape(1, fh),
        fc_bias.astype(jnp.float32).reshape(1, fh),
        fc2_p,
        fc2_scale.astype(jnp.float32).reshape(1, d),
        fc2_bias.astype(jnp.float32).reshape(1, d),
    )
