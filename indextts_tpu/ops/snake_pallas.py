"""Fused anti-aliased SnakeBeta as a Pallas TPU kernel.

One program per (batch, time-block): DMAs an input block + halo from HBM into
VMEM, computes the 2x kaiser-sinc upsample (as two 6-tap polyphase FIRs),
SnakeBeta, and the 12-tap stride-2 decimation entirely on-chip, and writes
one output block. The 2x-rate intermediate never touches HBM — the XLA
fallback (ops/snake.py) writes and re-reads it (2 x 2T samples), so fusion
removes ~2/3 of this op's HBM traffic. This is the TPU analog of the
reference's fused CUDA kernel
(bigvgan/alias_free_activation/cuda/anti_alias_activation_cuda.cu:44-179).

Polyphase algebra (matching ops/snake.py exactly; f = 12-tap kaiser-sinc):
  upsample2: xp = edge-pad(x, 5);  up[m] = 2 * sum_k xp[k] f[m + 15 - 2k]
    even phase: up[2t]   = 2 * sum_{m=0..5} f[11-2m] * xp[t + 2 + m]
    odd  phase: up[2t+1] = 2 * sum_{m=0..5} f[10-2m] * xp[t + 3 + m]
  downsample2: out[t] = sum_{j=0..11} f[j] * up_clamped[2t + j - 5]
    where up_clamped edge-replicates up[0] / up[2T-1] (LowPassFilter1d pads
    the upsampled signal, filter.py:85-103).

The kernel pre-pads x by HALO=8 (edge) so every block read is in-bounds, and
reproduces the up-signal edge clamping with global-position masks in the
first/last blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from indextts_tpu.ops.snake import _aa_filter

HALO = 8


def _filters():
    f = _aa_filter(2, 12).astype(np.float32)
    even_taps = [float(f[11 - 2 * m]) for m in range(6)]  # xp[t+2+m]
    odd_taps = [float(f[10 - 2 * m]) for m in range(6)]  # xp[t+3+m]
    down_taps = [float(w) for w in f]
    return even_taps, odd_taps, down_taps


def _kernel(x_hbm, alpha_ref, beta_ref, o_ref, scratch,
            sem, *, block_t: int, T: int, logscale: bool, n_blocks: int,
            total: int):
    even_taps, odd_taps, down_taps = _filters()
    b = pl.program_id(0)
    i = pl.program_id(1)
    block_start = i * block_t

    # DMA the input block + halo: x_hbm is (B, T_pad + 2*HALO, C) edge-padded;
    # local index p maps to global x index (block_start + p - HALO). Blocks
    # are double-buffered across grid steps (issue g+1's copy before g's
    # compute) so the HBM read overlaps the VPU work.
    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * block_t, block_t + 2 * HALO), :],
            scratch.at[slot], sem.at[slot],
        )

    g = b * n_blocks + i
    slot = jax.lax.rem(g, 2)
    nxt = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        dma(slot, b, i).start()

    @pl.when(g + 1 < total)
    def _():
        last = i + 1 >= n_blocks
        dma(nxt, jnp.where(last, b + 1, b), jnp.where(last, 0, i + 1)).start()

    dma(slot, b, i).wait()
    x = scratch[slot]  # (BT + 16, C) ; x[p] == x_global[block_start + p - 8]
    C = x.shape[1]

    # phases for t in [-3, BT+3): q = t - (block_start - 3) local phase index
    n_up = block_t + 6

    def fir(start, taps):
        # static slices only (Mosaic has no dynamic_slice on values)
        acc = taps[0] * x[start : start + n_up, :]
        for m in range(1, 6):
            acc = acc + taps[m] * x[start + m : start + m + n_up, :]
        return acc

    # up_even[q] (t = q-3+block_start): xp[t+2+m] = x_global[t-3+m] ->
    # local p = (q-3) + 2 + m - 5 + 8 = q + 2 + m  (xp[k] = x_global[k-5])
    up_even = 2.0 * fir(2, even_taps)
    up_odd = 2.0 * fir(3, odd_taps)

    alpha = alpha_ref[0, :]
    beta = beta_ref[0, :]
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)

    def snake(u):
        s = jnp.sin(u * alpha[None, :])
        return u + (1.0 / (beta[None, :] + 1e-9)) * s * s

    up_even = snake(up_even)
    up_odd = snake(up_odd)

    # edge clamping of the up signal at global boundaries (cross-phase):
    # up[m<0] := up[0] (= even phase t=0), up[m>2T-1] := up[2T-1] (= odd
    # phase t=T-1). The boundary row is selected by masked reduction over the
    # sublane axis (exactly one row matches inside the affected block) — no
    # VMEM staging refs, which keeps the scoped-VMEM budget for the doubled
    # DMA scratch (2x block-sized staging refs OOM'd at C=2304 batched).
    g = jax.lax.broadcasted_iota(jnp.int32, (n_up, C), 0) + (block_start - 3)
    row0 = jnp.sum(jnp.where(g == 0, up_even, 0.0), axis=0, keepdims=True)
    rowT = jnp.sum(jnp.where(g == T - 1, up_odd, 0.0), axis=0, keepdims=True)
    up_even = jnp.where(g < 0, row0, up_even)
    up_odd = jnp.where(g < 0, row0, up_odd)
    up_even = jnp.where(g > T - 1, rowT, up_even)
    # odd phase position 2t+1 exceeds 2T-1 iff t >= T
    up_odd = jnp.where(g > T - 1, rowT, up_odd)

    # downsample: out[t] = sum_j down[j] * up[2t + j - 5]
    # up[2k] = up_even[q=k-block_start+3]; up[2k+1] = up_odd[same q]
    acc = None
    for j, w in enumerate(down_taps):
        ofs = j - 5
        phase = ofs & 1
        per = (ofs - phase) // 2
        src = up_odd if phase else up_even
        term = w * src[per + 3 : per + 3 + block_t, :]
        acc = term if acc is None else acc + term
    o_ref[:] = acc


def _kernel_t(x_hbm, alpha_ref, beta_ref, o_ref, scratch, sem, *,
              block_t: int, T: int, logscale: bool, n_blocks: int,
              total: int):
    """Time-on-lanes variant: x is (B, C8, T) so the FIRs run as static lane
    slices at full lane utilization regardless of channel count. The lane
    halo is 128 (DMA alignment); the FIR only needs 8. Input blocks are
    double-buffered across grid steps: block g+1's DMA is issued before
    block g's compute, so HBM reads overlap the VPU work."""
    even_taps, odd_taps, down_taps = _filters()
    H = 128
    b = pl.program_id(0)
    i = pl.program_id(1)
    block_start = i * block_t

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, :, pl.ds(ii * block_t, block_t + 2 * H)],
            scratch.at[slot], sem.at[slot],
        )

    g = b * n_blocks + i
    slot = jax.lax.rem(g, 2)
    nxt = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        dma(slot, b, i).start()

    @pl.when(g + 1 < total)
    def _():
        last = i + 1 >= n_blocks
        dma(nxt, jnp.where(last, b + 1, b), jnp.where(last, 0, i + 1)).start()

    dma(slot, b, i).wait()
    x = scratch[slot]  # (C8, BT + 256); x[:, p] == x_global[block_start + p - 128]
    C8 = x.shape[0]
    n_up = block_t + 6

    def fir(start, taps):
        acc = taps[0] * x[:, start : start + n_up]
        for m in range(1, 6):
            acc = acc + taps[m] * x[:, start + m : start + m + n_up]
        return acc

    # same phase algebra as _kernel, lane-shifted by H - HALO = 120
    up_even = 2.0 * fir(122, even_taps)
    up_odd = 2.0 * fir(123, odd_taps)

    alpha = alpha_ref[:, 0:1]
    beta = beta_ref[:, 0:1]
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)

    def snake(u):
        s = jnp.sin(u * alpha)
        return u + (1.0 / (beta + 1e-9)) * s * s

    up_even = snake(up_even)
    up_odd = snake(up_odd)

    # edge clamping of the up signal: positions < 0 take up[0] (even phase,
    # t=0), positions > 2T-1 take up[2T-1] (odd phase, t=T-1). Dynamic lane
    # reads are awkward; select the boundary column by masked reduction
    # instead (exactly one lane matches inside the affected block).
    g = jax.lax.broadcasted_iota(jnp.int32, (C8, n_up), 1) + (block_start - 3)
    row0 = jnp.sum(jnp.where(g == 0, up_even, 0.0), axis=1, keepdims=True)
    rowT = jnp.sum(jnp.where(g == T - 1, up_odd, 0.0), axis=1, keepdims=True)
    up_even = jnp.where(g < 0, row0, up_even)
    up_odd = jnp.where(g < 0, row0, up_odd)
    up_even = jnp.where(g > T - 1, rowT, up_even)
    up_odd = jnp.where(g > T - 1, rowT, up_odd)

    acc = None
    for j, w in enumerate(down_taps):
        ofs = j - 5
        phase = ofs & 1
        per = (ofs - phase) // 2
        src = up_odd if phase else up_even
        term = w * src[:, per + 3 : per + 3 + block_t]
        acc = term if acc is None else acc + term
    o_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("logscale", "block_t", "interpret")
)
def anti_alias_snake_pallas_t(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    logscale: bool = True,
    block_t: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Transposed-layout fused up2 -> snakebeta -> down2 (exact match of
    ops/snake.anti_alias_snake). Channels ride the 8-wide sublane axis and
    time rides the 128-wide lane axis, so narrow-channel stages (24..192ch,
    where most of BigVGAN's samples live) run at full VPU lane utilization —
    the channel-major kernel/XLA pad those to 128 lanes (up to 5.3x waste).

    x: (B, T, C) float32 -> (B, T, C)."""
    B, T, C_in = x.shape
    H = 128
    C8 = -(-C_in // 8) * 8  # f32 sublane tile
    # same scoped-VMEM discipline as the channel-major wrapper (~1 MB per
    # block-sized buffer); lane blocks stay 128-multiples for aligned DMA
    while block_t > 256 and block_t * C8 * 4 > 1024 * 1024:
        block_t //= 2
    n_blocks = -(-T // block_t)
    T_pad = n_blocks * block_t
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)  # (B, C, T)
    if C8 != C_in:
        xt = jnp.pad(xt, ((0, 0), (0, C8 - C_in), (0, 0)))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (H, H + (T_pad - T))), mode="edge")
    a2 = jnp.pad(alpha.reshape(C_in, 1), ((0, C8 - C_in), (0, 0))).astype(jnp.float32)
    b2 = jnp.pad(beta.reshape(C_in, 1), ((0, C8 - C_in), (0, 0))).astype(jnp.float32)

    kern = functools.partial(
        _kernel_t, block_t=block_t, T=T, logscale=logscale,
        n_blocks=n_blocks, total=B * n_blocks,
    )
    out = pl.pallas_call(
        kern,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # manual DMA
            pl.BlockSpec((C8, 1), lambda b, i: (0, 0)),
            pl.BlockSpec((C8, 1), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, C8, block_t), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, C8, T_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, C8, block_t + 2 * H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, a2, b2)
    return jnp.swapaxes(out[:, :C_in, :T], 1, 2)


@functools.partial(
    jax.jit, static_argnames=("logscale", "block_t", "interpret")
)
def anti_alias_snake_pallas(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    logscale: bool = True,
    block_t: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused up2 -> snakebeta -> down2; exact match of ops/snake.anti_alias_snake.

    x: (B, T, C) float32 -> (B, T, C)."""
    B, T, C_in = x.shape
    C = C_in
    # Mosaic DMA slices must be lane-tile (128) aligned on the minor dim:
    # zero-pad channels up. Padded lanes stay exactly 0 through the whole
    # pipeline (FIRs are linear; snake(0) = 0 + sin(0)^2/beta = 0).
    Cp = -(-C // 128) * 128
    # scoped VMEM is 16 MB and Mosaic's accounting holds ~12-15 live
    # block-sized buffers (scratch, up phases, iotas, FIR temporaries,
    # double-buffered out): keep each under ~1 MB
    while block_t > 128 and block_t * Cp * 4 > 1024 * 1024:
        block_t //= 2
    n_blocks = -(-T // block_t)
    T_pad = n_blocks * block_t
    xp = x.astype(jnp.float32)
    if Cp != C:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, Cp - C)))
    xp = jnp.pad(xp, ((0, 0), (HALO, HALO + (T_pad - T)), (0, 0)), mode="edge")
    a2 = jnp.pad(alpha.reshape(1, C), ((0, 0), (0, Cp - C))).astype(jnp.float32)
    b2 = jnp.pad(beta.reshape(1, C), ((0, 0), (0, Cp - C))).astype(jnp.float32)
    C = Cp

    kern = functools.partial(
        _kernel, block_t=block_t, T=T, logscale=logscale,
        n_blocks=n_blocks, total=B * n_blocks,
    )
    out = pl.pallas_call(
        kern,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; manual DMA
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_t, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block_t + 2 * HALO, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, a2, b2)
    return out[:, :T, :C_in]
