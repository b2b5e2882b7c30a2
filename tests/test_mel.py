"""Golden tests for the mel front-end vs torch.stft reference semantics.

The reference computes mel via torch.stft + librosa slaney filters
(audio.py:45-82). librosa is not installed here, so the filterbank itself is
checked against hand-computed invariants and the STFT path is checked against
torch.stft numerically.
"""

import numpy as np
import pytest
import torch

from indextts_tpu.config import MelConfig
from indextts_tpu.ops import mel as mel_ops


def torch_reference_mel(y: np.ndarray, cfg: MelConfig, fb: np.ndarray) -> np.ndarray:
    """Reimplementation of the reference audio.py:45-82 pipeline in torch,
    taking the mel filterbank as input (librosa is unavailable)."""
    yt = torch.from_numpy(y).float()
    pad = int((cfg.n_fft - cfg.hop_length) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt,
        cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.hann_window(cfg.win_length),
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    spec = torch.matmul(torch.from_numpy(fb), spec)
    spec = torch.log(torch.clamp(spec, min=1e-5))
    return spec.numpy()


@pytest.mark.parametrize("nsamples", [22050, 8000])
def test_mel_matches_torch_reference(rng, nsamples):
    cfg = MelConfig()
    y = rng.standard_normal((2, nsamples)).astype(np.float32) * 0.1
    fb = mel_ops.mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    ref = torch_reference_mel(y, cfg, fb)
    got = np.asarray(mel_ops.mel_spectrogram(y, cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_mel_frame_count(rng):
    cfg = MelConfig()
    for n in (22050, 12345, 4096):
        y = rng.standard_normal((1, n)).astype(np.float32)
        got = np.asarray(mel_ops.mel_spectrogram(y, cfg))
        assert got.shape[2] == mel_ops.mel_frame_count(n, cfg)


def test_filterbank_invariants():
    """Slaney filterbank: correct shape, rows are unimodal triangles, and
    center frequencies are monotonically increasing."""
    fb = mel_ops.mel_filterbank(22050, 1024, 80, 0.0, None)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()
    # slaney-normalized filters: each row integrates to ~2/(band width in Hz)
    # so higher filters (wider bands) have smaller peaks
    assert fb.max(axis=1)[0] > fb.max(axis=1)[-1]


def test_hz_mel_roundtrip():
    f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(mel_ops.mel_to_hz(mel_ops.hz_to_mel(f)), f, rtol=1e-10)
    np.testing.assert_allclose(
        mel_ops.mel_to_hz(mel_ops.hz_to_mel(f, htk=True), htk=True), f, rtol=1e-10
    )


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        mel_ops.hann_window(1024), torch.hann_window(1024).numpy(), atol=2e-6
    )
