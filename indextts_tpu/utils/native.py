"""ctypes bindings for the native host DSP library (csrc/dsp.cpp).

Builds the shared library on first use (g++), caches it next to the source,
and falls back silently to the numpy implementations in frontend/features.py
when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
SO_PATH = CSRC / "libindextts_dsp.so"


def _build() -> bool:
    src = CSRC / "dsp.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(SO_PATH), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(SO_PATH))
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        lib.kaldi_fbank.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, f32p,
        ]
        lib.kaldi_fbank.restype = ctypes.c_int
        lib.resample_poly.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                      ctypes.c_int, f32p]
        lib.resample_poly.restype = ctypes.c_int64
        lib.pcm16_to_float.argtypes = [i16p, ctypes.c_int64, f32p]
        lib.float_to_pcm16.argtypes = [f32p, ctypes.c_int64, i16p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def kaldi_fbank(
    wav: np.ndarray,
    num_mel_bins: int = 80,
    sample_rate: int = 16000,
    frame_length: int = 400,
    hop: int = 160,
    fft_length: int = 512,
    preemphasis: float = 0.97,
    low_freq: float = 20.0,
    high_freq: Optional[float] = None,
    mel_floor: float = 1.192092955078125e-07,
) -> np.ndarray:
    """Native kaldi fbank; same semantics as features.kaldi_fbank_core."""
    lib = get_lib()
    wav = np.ascontiguousarray(np.squeeze(wav), dtype=np.float32)
    if high_freq is None:
        high_freq = sample_rate / 2
    if lib is None:
        from indextts_tpu.frontend.features import kaldi_fbank_core

        return kaldi_fbank_core(
            wav, num_mel_bins, sample_rate, frame_length, hop, fft_length,
            preemphasis, low_freq, high_freq, mel_floor,
        )
    n_frames = max(0, 1 + (len(wav) - frame_length) // hop)
    out = np.empty((n_frames, num_mel_bins), np.float32)
    if n_frames:
        got = lib.kaldi_fbank(
            wav, len(wav), num_mel_bins, sample_rate, frame_length, hop,
            fft_length, preemphasis, low_freq, high_freq, mel_floor, out,
        )
        assert got == n_frames
    return out


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(np.squeeze(x), dtype=np.float32)
    if sr_in == sr_out:
        return x
    if lib is None:
        from indextts_tpu.utils.audio import resample as np_resample

        return np_resample(x, sr_in, sr_out)
    g = np.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    out = np.empty((len(x) * up + down - 1) // down, np.float32)
    n = lib.resample_poly(x, len(x), up, down, out)
    return out[:n]


def float_to_pcm16(x: np.ndarray) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(np.squeeze(x), dtype=np.float32)
    if lib is None:
        return np.clip(x * 32767.0, -32767, 32767).astype(np.int16)
    out = np.empty(len(x), np.int16)
    lib.float_to_pcm16(x, len(x), out)
    return out
