"""STFT + mel-spectrogram as MXU-friendly matmuls.

Parity target: the reference's `mel_spectrogram` (indextts/s2mel/modules/audio.py:45-82):
reflect-pad by (n_fft-hop)/2, torch.stft(center=False, hann, onesided),
magnitude = sqrt(re^2 + im^2 + 1e-9), slaney mel filterbank (librosa semantics),
log-compress with 1e-5 clamp.

TPU-first design: an STFT is a windowed frame matrix multiplied by a real DFT
basis — two (frames, n_fft) x (n_fft, n_freq) matmuls that map straight onto
the MXU, instead of an FFT butterfly that XLA:TPU handles poorly. The mel
projection is a third matmul. Everything here is shape-static and jittable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import MelConfig


# ---------------------------------------------------------------------------
# Filterbank construction (host-side, numpy)
# ---------------------------------------------------------------------------


def hz_to_mel(frequencies, htk: bool = False):
    """librosa-compatible Hz->mel. Slaney formula by default."""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_min = 0.0
    f_sp = 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = frequencies >= min_log_hz
        mels[log_t] = min_log_mel + np.log(frequencies[log_t] / min_log_hz) / logstep
    elif frequencies >= min_log_hz:
        mels = min_log_mel + np.log(frequencies / min_log_hz) / logstep
    return mels


def mel_to_hz(mels, htk: bool = False):
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min = 0.0
    f_sp = 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t] - min_log_mel))
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, librosa.filters.mel semantics.

    Returns (n_mels, 1 + n_fft//2) float32."""
    if fmax is None:
        fmax = float(sr) / 2
    n_freq = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, float(sr) / 2, n_freq, endpoint=True)

    min_mel = hz_to_mel(fmin, htk=htk)
    max_mel = hz_to_mel(fmax, htk=htk)
    mels = np.linspace(min_mel, max_mel, n_mels + 2)
    mel_f = mel_to_hz(mels, htk=htk)

    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)

    weights = np.zeros((n_mels, n_freq), dtype=np.float64)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, np.newaxis]

    return weights.astype(np.float32)


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """torch.hann_window semantics (periodic by default)."""
    if periodic:
        n = np.arange(win_length, dtype=np.float64)
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    else:
        w = np.hanning(win_length)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int) -> tuple:
    """Real-DFT basis matrices (n_fft, n_freq) with the window folded in."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freq, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    win = hann_window(win_length).astype(np.float64)
    if win_length < n_fft:
        # torch.stft centers the window inside the frame
        pad_l = (n_fft - win_length) // 2
        win = np.pad(win, (pad_l, n_fft - win_length - pad_l))
    cos_b = (np.cos(ang) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * win[:, None]).astype(np.float32)
    return cos_b, sin_b


# ---------------------------------------------------------------------------
# Jittable compute
# ---------------------------------------------------------------------------


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, frames, n_fft) with frame i = y[i*hop : i*hop+n_fft].

    Implemented as a gather with a static index matrix; XLA lowers this to a
    cheap dynamic-slice loop fused with the following matmul."""
    T = y.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(
        np.int32
    )
    return y[..., idx]


def stft_real_imag(
    y: jnp.ndarray, n_fft: int, hop: int, win_length: int
) -> tuple:
    """Real/imag STFT via two MXU matmuls. y: (B, T) already padded.

    Returns (real, imag) each (B, frames, n_freq)."""
    cos_b, sin_b = _dft_basis(n_fft, win_length)
    frames = frame_signal(y, n_fft, hop)
    # HIGHEST precision: the mel spectrum is the cross-framework parity metric,
    # so the DFT matmuls must run in true fp32 even on TPU (where the default
    # is bf16 inputs). Cost is negligible next to the model stages.
    prec = jax.lax.Precision.HIGHEST
    real = jnp.matmul(frames, jnp.asarray(cos_b), precision=prec)
    imag = jnp.matmul(frames, jnp.asarray(sin_b), precision=prec)
    return real, imag


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Log-mel spectrogram with exact reference semantics (audio.py:45-82).

    Args:
      y: (B, T) waveform in [-1, 1], float32, at cfg.sample_rate.
    Returns:
      (B, n_mels, frames) float32 log-mel.
    """
    pad = (cfg.n_fft - cfg.hop_length) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    real, imag = stft_real_imag(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    mag = jnp.sqrt(real * real + imag * imag + 1e-9)
    fb = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )
    # (B, frames, n_freq) @ (n_freq, n_mels) -> (B, frames, n_mels)
    mel = jnp.matmul(mag, fb.T, precision=jax.lax.Precision.HIGHEST)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    return jnp.swapaxes(mel, 1, 2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram_v1(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """v1 conditioning mel: torchaudio.MelSpectrogram semantics as used by
    MelSpectrogramFeatures (utils/feature_extractors.py:24-50): center=True
    (reflect pad n_fft//2), power=1 magnitude, HTK mel scale with no norm,
    safe_log clip 1e-7 (utils/common.py:110).

    y: (B, T) -> (B, n_mels, frames), frames = T//hop + 1."""
    pad = cfg.n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    real, imag = stft_real_imag(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    mag = jnp.sqrt(real * real + imag * imag)
    fb = jnp.asarray(
        mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax,
            htk=True, norm=None,
        )
    )
    mel = jnp.matmul(mag, fb.T, precision=jax.lax.Precision.HIGHEST)
    mel = jnp.log(jnp.clip(mel, min=1e-7))
    return jnp.swapaxes(mel, 1, 2)


def mel_frame_count(num_samples: int, cfg: MelConfig) -> int:
    """Number of mel frames `mel_spectrogram` produces for a T-sample input."""
    padded = num_samples + 2 * ((cfg.n_fft - cfg.hop_length) // 2)
    return 1 + (padded - cfg.n_fft) // cfg.hop_length
