"""Native C++ DSP library vs numpy reference implementations."""

import numpy as np
import pytest

from indextts_tpu.frontend import features as F
from indextts_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("g++ unavailable; native DSP not built")
    return native.get_lib()


def test_native_kaldi_fbank_matches_numpy(lib, rng):
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    want = F.kaldi_fbank_core(wav)
    got = native.kaldi_fbank(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_native_fbank_short_input(lib):
    assert native.kaldi_fbank(np.zeros(100, np.float32)).shape == (0, 80)


def test_native_resample_close_to_scipy(lib, rng):
    from indextts_tpu.utils.audio import resample as sp_resample

    t = np.arange(16000) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    got = native.resample(x, 16000, 22050)
    want = sp_resample(x, 16000, 22050)
    n = min(len(got), len(want))
    # different FIR designs; require close agreement away from the edges
    body = slice(500, n - 500)
    err = np.abs(got[body] - want[body]).max()
    assert err < 5e-3, err


def test_native_pcm16(lib):
    x = np.array([0.0, 0.5, -0.5, 2.0, -2.0], np.float32)
    out = native.float_to_pcm16(x)
    assert out[0] == 0
    assert out[3] == 32767 and out[4] == -32767


def test_fbank_dispatch_native_matches_numpy(lib, rng, monkeypatch):
    """The product path (seamless_features/campplus_fbank) routes through the
    native fbank; outputs must match the numpy-only path to 1e-4."""
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    monkeypatch.setenv("INDEXTTS_NATIVE_DSP", "1")
    f_native, m1 = F.seamless_features(wav)
    c_native = F.campplus_fbank(wav)
    monkeypatch.setenv("INDEXTTS_NATIVE_DSP", "0")
    f_np, m2 = F.seamless_features(wav)
    c_np = F.campplus_fbank(wav)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_allclose(f_native, f_np, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(c_native, c_np, atol=2e-4, rtol=1e-3)


def test_pcm16_bytes_native_matches_numpy(lib, monkeypatch):
    from indextts_tpu.utils.audio import pcm16_bytes

    x = np.linspace(-1.2, 1.2, 1000).astype(np.float32)
    monkeypatch.setenv("INDEXTTS_NATIVE_DSP", "1")
    got = np.frombuffer(pcm16_bytes(x), np.int16)
    monkeypatch.setenv("INDEXTTS_NATIVE_DSP", "0")
    want = np.frombuffer(pcm16_bytes(x), np.int16)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
