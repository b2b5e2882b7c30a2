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


def anti_alias_snake(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool = True
) -> jnp.ndarray:
    """Activation1d (act.py): up2 -> snakebeta -> down2. x: (B, T, C).

    On TPU the fused Pallas kernel (ops/snake_pallas.py; bit-exact vs this
    implementation, measured 15% faster end-to-end on v5e) is the default for
    lane-friendly channel counts; INDEXTTS_PALLAS_SNAKE=0 forces XLA."""
    import os

    if os.environ.get("INDEXTTS_PALLAS_SNAKE", "1") == "1":
        import jax as _jax

        C = x.shape[-1]
        if _jax.default_backend() not in ("cpu",):
            # wide stages: channels ride the 128 lanes (zero-padded up).
            # narrow stages (24..96ch — most of BigVGAN's samples): the
            # transposed kernel puts TIME on the lanes and channels on the
            # 8-wide sublanes, so lane utilization stays full where the
            # channel-major layout would waste up to 5.3x
            # threshold from the v5e per-stage sweep (amortized): C-major
            # wins at ratio <= 1.11 (C=576,1152,2304), T-major from 1.33 up
            # (C=288: 2.22 vs 2.45ms; C=144: 2.06 vs 3.02; C=24: 0.98 vs 2.88)
            pad_ratio = (-(-C // 128) * 128) / C
            if pad_ratio <= 1.3:
                from indextts_tpu.ops.snake_pallas import anti_alias_snake_pallas

                return anti_alias_snake_pallas(x, alpha, beta, logscale)
            from indextts_tpu.ops.snake_pallas import anti_alias_snake_pallas_t

            return anti_alias_snake_pallas_t(x, alpha, beta, logscale)
    y = upsample2(x)
    y = snake_beta(y, alpha, beta, logscale)
    return downsample2(y)
