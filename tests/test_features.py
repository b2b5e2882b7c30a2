"""Validate our kaldi fbank front-end against the installed transformers
SeamlessM4TFeatureExtractor (the exact library the reference calls)."""

import numpy as np

from indextts_tpu.frontend import features as F


def test_seamless_features_match_hf(rng):
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor()
    wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    ref = fe(wav, sampling_rate=16000, return_tensors="np")
    want_feats = ref["input_features"]
    want_mask = ref["attention_mask"]

    got_feats, got_mask = F.seamless_features(wav)
    assert got_feats.shape == want_feats.shape
    np.testing.assert_array_equal(got_mask, want_mask)
    np.testing.assert_allclose(got_feats, want_feats, atol=2e-4, rtol=1e-3)


def test_seamless_features_odd_length(rng):
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor()
    wav = (rng.standard_normal(12345) * 0.05).astype(np.float32)
    ref = fe(wav, sampling_rate=16000, return_tensors="np")
    got_feats, got_mask = F.seamless_features(wav)
    assert got_feats.shape == ref["input_features"].shape
    np.testing.assert_allclose(got_feats, ref["input_features"], atol=2e-4, rtol=1e-3)


def test_campplus_fbank_shape(rng):
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    fb = F.campplus_fbank(wav)
    assert fb.shape == ((16000 - 400) // 160 + 1, 80)
    assert np.isfinite(fb).all()
