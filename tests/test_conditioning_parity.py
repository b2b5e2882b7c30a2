"""Golden parity: RepCodec semantic VQ and CAMPPlus speaker encoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import import_reference  # noqa: E402

from indextts_tpu.config import CampPlusConfig, SemanticCodecConfig  # noqa: E402
from indextts_tpu.models.campplus import CAMPPlus  # noqa: E402
from indextts_tpu.models.repcodec import RepCodec  # noqa: E402
from indextts_tpu.runtime import torch_convert as tc  # noqa: E402


CODEC_TINY = SemanticCodecConfig(
    codebook_size=64,
    hidden_size=48,
    codebook_dim=8,
    vocos_dim=24,
    vocos_intermediate_dim=40,
    vocos_num_layers=3,
)


@pytest.fixture(scope="module")
def repcodec_pair():
    torch.manual_seed(11)
    rm = import_reference("indextts.utils.maskgct.models.codec.kmeans.repcodec_model")
    ref = rm.RepCodec(
        codebook_size=CODEC_TINY.codebook_size,
        hidden_size=CODEC_TINY.hidden_size,
        codebook_dim=CODEC_TINY.codebook_dim,
        vocos_dim=CODEC_TINY.vocos_dim,
        vocos_intermediate_dim=CODEC_TINY.vocos_intermediate_dim,
        vocos_num_layers=CODEC_TINY.vocos_num_layers,
    ).eval()
    model = RepCodec(CODEC_TINY)
    params = {"params": tc.convert_repcodec(tc.to_numpy_sd(ref.state_dict()), CODEC_TINY)}
    return ref, model, params


def test_repcodec_quantize_parity(repcodec_pair, rng):
    ref, model, params = repcodec_pair
    x = rng.standard_normal((2, 19, CODEC_TINY.hidden_size)).astype(np.float32)
    with torch.no_grad():
        want_codes, want_emb = ref.quantize(torch.from_numpy(x))
    got_codes, got_emb = model.apply(params, jnp.asarray(x), method=RepCodec.quantize)
    np.testing.assert_array_equal(np.asarray(got_codes), want_codes.numpy())
    np.testing.assert_allclose(
        np.asarray(got_emb), want_emb.numpy(), atol=2e-5, rtol=1e-4
    )


def test_repcodec_vq2emb_parity(repcodec_pair, rng):
    ref, model, params = repcodec_pair
    codes = rng.integers(0, CODEC_TINY.codebook_size, (1, 17)).astype(np.int64)
    with torch.no_grad():
        # reference vq2emb takes (num_q, B, T) and returns (B, D, T)
        want = ref.quantizer.vq2emb(torch.from_numpy(codes).unsqueeze(0)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(codes), method=RepCodec.vq2emb))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5, rtol=1e-4)


def test_campplus_parity(rng):
    torch.manual_seed(5)
    dt = import_reference("indextts.s2mel.modules.campplus.DTDNN")
    cfg = CampPlusConfig(feat_dim=80, embedding_size=192)
    ref = dt.CAMPPlus(feat_dim=80, embedding_size=192).eval()
    # randomize running stats so BN conversion is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.3)
    model = CAMPPlus(cfg)
    params = {"params": tc.convert_campplus(tc.to_numpy_sd(ref.state_dict()), cfg)}

    x = rng.standard_normal((1, 230, 80)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-2)
