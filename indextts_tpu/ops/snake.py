"""Anti-aliased SnakeBeta activation: 2x kaiser-sinc upsample -> snake ->
2x kaiser-sinc downsample, replicate padding.

Parity target: the reference's fused CUDA kernel
(bigvgan/alias_free_activation/cuda/anti_alias_activation_cuda.cu:44-179)
whose semantics equal the torch fallback
(alias_free_activation/torch/{filter,resample,act}.py): UpSample1d(2) with a
12-tap kaiser-windowed sinc, SnakeBeta (log-scale alphas), DownSample1d(2).

This file provides the XLA implementation (depthwise convs with a shared
filter; XLA fuses the elementwise snake into the surrounding convs). A fused
Pallas kernel that keeps the 2x-rate intermediate in VMEM is in
ops/snake_pallas.py and is used when enabled.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """filter.py:30-62 semantics; returns (kernel_size,) float32, sum = 1."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _aa_filter(ratio: int, kernel_size: int) -> np.ndarray:
    return kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)


def _depthwise(x: jnp.ndarray, filt: jnp.ndarray, stride: int, lhs_dilation: int, pad):
    """x: (B, T, C); filt: (K,) shared across channels."""
    C = x.shape[-1]
    k = filt.shape[0]
    kernel = jnp.broadcast_to(filt[:, None, None], (k, 1, C)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[pad],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )


def upsample2(x: jnp.ndarray, kernel_size: int = 12) -> jnp.ndarray:
    """UpSample1d(ratio=2) (resample.py:10-38): replicate pad, zero-stuffed
    transposed conv with the sinc filter, x2 gain, edge trim. (B,T,C)->(B,2T,C)."""
    ratio = 2
    k = kernel_size
    pad = k // ratio - 1  # 5
    pad_left = pad * ratio + (k - ratio) // 2  # 15
    pad_right = pad * ratio + (k - ratio + 1) // 2  # 15
    filt = jnp.asarray(_aa_filter(ratio, k))
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # conv_transpose(stride=2) == lhs_dilation=2 + convolution (flipped corr)
    y = _depthwise(xp, filt[::-1], stride=1, lhs_dilation=ratio, pad=(k - 1, k - 1))
    y = ratio * y
    return y[:, pad_left:-pad_right]


def downsample2(x: jnp.ndarray, kernel_size: int = 12) -> jnp.ndarray:
    """DownSample1d(ratio=2) == LowPassFilter1d stride 2 (filter.py:65-103)."""
    ratio = 2
    k = kernel_size
    even = k % 2 == 0
    pad_left = k // 2 - int(even)  # 5
    pad_right = k // 2  # 6
    filt = jnp.asarray(_aa_filter(ratio, k))
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise(xp, filt, stride=ratio, lhs_dilation=1, pad=(0, 0))


def snake_beta(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool
) -> jnp.ndarray:
    """SnakeBeta (activations.py:62-120): x + 1/(beta+eps) * sin^2(alpha x)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    s = jnp.sin(x * alpha)
    return x + (1.0 / (beta + 1e-9)) * s * s


def anti_alias_snake_sliced(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool = True
) -> jnp.ndarray:
    """Fused up2 -> snakebeta -> down2 as static slices + multiply-adds.

    Same polyphase algebra (and float accumulation order) as the Pallas
    kernel in ops/snake_pallas.py, expressed as pure elementwise XLA ops so
    the whole activation fuses into a handful of vector loops — no depthwise
    convolutions. The conv-based path (upsample2/downsample2) lowers each
    12-tap depthwise conv separately and measured ~18 ms per call at
    B=8/T*C=7M on v5e (~60 GB/s effective); this formulation removes that
    bottleneck. x: (B, T, C)."""
    even_taps, odd_taps, down_taps = _sliced_taps()
    B, T, C = x.shape
    n_up = T + 6
    xg = jnp.pad(x, ((0, 0), (8, 8), (0, 0)), mode="edge")
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)

    def fir(start, taps):
        acc = taps[0] * xg[:, start : start + n_up, :]
        for m in range(1, 6):
            acc = acc + taps[m] * xg[:, start + m : start + m + n_up, :]
        return acc

    up_even = 2.0 * fir(2, even_taps)
    up_odd = 2.0 * fir(3, odd_taps)

    def snake(u):
        s = jnp.sin(u * alpha[None, None, :])
        return u + (1.0 / (beta[None, None, :] + 1e-9)) * s * s

    up_even = snake(up_even)
    up_odd = snake(up_odd)

    # edge clamping of the up signal at global boundaries (see snake_pallas):
    # up[m<0] := up[0] (even phase t=0 at row 3), up[m>2T-1] := up[2T-1]
    # (odd phase t=T-1 at row T+2)
    g = (jnp.arange(n_up) - 3)[None, :, None]
    row0 = up_even[:, 3:4, :]
    rowT = up_odd[:, T + 2 : T + 3, :]
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
        term = w * src[:, per + 3 : per + 3 + T, :]
        acc = term if acc is None else acc + term
    return acc


@functools.lru_cache(maxsize=1)
def _sliced_taps():
    f = _aa_filter(2, 12).astype(np.float32)
    even = [float(f[11 - 2 * m]) for m in range(6)]
    odd = [float(f[10 - 2 * m]) for m in range(6)]
    down = [float(w) for w in f]
    return even, odd, down


def anti_alias_snake(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool = True
) -> jnp.ndarray:
    """Activation1d (act.py): up2 -> snakebeta -> down2. x: (B, T, C).

    Implementation dispatch (INDEXTTS_SNAKE_IMPL, default "auto"), set from
    the r3 v5e sweep (tools/tpu_lab.py campaign; full-vocoder forward,
    768 mel frames):
      * "sliced" — fused elementwise FIRs (anti_alias_snake_sliced). Wins
        single-stream: B=1 vocoder 0.137 s vs 0.274 (conv) / 0.19 (pallas).
      * "conv"   — depthwise-conv form (the original/parity reference).
        Wins batched: B=8 vocoder 0.85 s fp32 / 0.55 s bf16 vs 1.11 / 0.76
        for sliced and 1.00 for pallas.
      * "pallas" — VMEM-fused kernel (ops/snake_pallas.py; r2's default) —
        superseded on both shapes, kept opt-in for re-measurement.
    "auto" = sliced when B == 1, conv otherwise. The legacy
    INDEXTTS_PALLAS_SNAKE=0 still forces the non-pallas path."""
    import os

    impl = os.environ.get("INDEXTTS_SNAKE_IMPL", "auto")
    if impl == "auto":
        impl = "sliced" if x.shape[0] == 1 else "conv"
    if os.environ.get("INDEXTTS_PALLAS_SNAKE", "1") == "0" and impl == "pallas":
        impl = "sliced"
    if impl == "pallas":
        import jax as _jax

        C = x.shape[-1]
        if _jax.default_backend() not in ("cpu",):
            # wide stages: channels ride the 128 lanes (zero-padded up);
            # narrow stages: time-on-lanes transposed kernel (v5e sweep)
            pad_ratio = (-(-C // 128) * 128) / C
            if pad_ratio <= 1.3:
                from indextts_tpu.ops.snake_pallas import anti_alias_snake_pallas

                return anti_alias_snake_pallas(x, alpha, beta, logscale)
            from indextts_tpu.ops.snake_pallas import anti_alias_snake_pallas_t

            return anti_alias_snake_pallas_t(x, alpha, beta, logscale)
        impl = "sliced"
    if impl == "sliced":
        return anti_alias_snake_sliced(x, alpha, beta, logscale)
    y = upsample2(x)
    y = snake_beta(y, alpha, beta, logscale)
    return downsample2(y)
