"""Golden parity for the v1 model family: UnifiedVoice v1, ECAPA-TDNN,
BigVGAN v1, DVAE tokenizer."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import import_reference  # noqa: E402

from indextts_tpu.config import ConditionModuleConfig, GPTConfig  # noqa: E402
from indextts_tpu.models.bigvgan_v1 import BigVGANv1, BigVGANv1Config  # noqa: E402
from indextts_tpu.models.dvae import DVAE, DVAEConfig  # noqa: E402
from indextts_tpu.models.ecapa import ECAPA_TDNN  # noqa: E402
from indextts_tpu.models.unified_voice_v1 import UnifiedVoiceV1  # noqa: E402
from indextts_tpu.runtime import torch_convert as tc  # noqa: E402
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig  # noqa: E402


V1_TINY = dict(
    layers=2,
    model_dim=64,
    heads=4,
    max_text_tokens=40,
    max_mel_tokens=60,
    number_text_tokens=50,
    number_mel_codes=66,
    start_mel_token=64,
    stop_mel_token=65,
    condition_type="conformer_perceiver",
    condition_module=dict(
        output_size=32, linear_units=48, attention_heads=4, num_blocks=2,
        input_layer="conv2d2", perceiver_mult=2,
    ),
)


@pytest.fixture(scope="module")
def v1_pair():
    torch.manual_seed(13)
    mv1 = import_reference("indextts.gpt.model")
    ref = mv1.UnifiedVoice(**V1_TINY).eval()
    cfg = GPTConfig(
        model_dim=64, layers=2, heads=4, max_mel_tokens=60, max_text_tokens=40,
        number_text_tokens=50, number_mel_codes=66, start_mel_token=64,
        stop_mel_token=65,
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=48, attention_heads=4, num_blocks=2,
            input_size=100,
        ),
    )
    model = UnifiedVoiceV1(cfg)
    params = {"params": tc.convert_unified_voice_v1(tc.to_numpy_sd(ref.state_dict()), cfg)}
    return ref, model, params, cfg


def test_v1_conditioning_parity(v1_pair, rng):
    ref, model, params, cfg = v1_pair
    mel = rng.standard_normal((1, 100, 45)).astype(np.float32)  # (B, mel, T)
    lens = np.array([45])
    with torch.no_grad():
        want = ref.get_conditioning(
            torch.from_numpy(mel), torch.from_numpy(lens)
        ).numpy()
    got = np.asarray(
        model.apply(
            params,
            jnp.asarray(mel.transpose(0, 2, 1)),
            jnp.asarray(lens),
            method=UnifiedVoiceV1.get_conditioning,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_v1_forward_latent_parity(v1_pair, rng):
    ref, model, params, cfg = v1_pair
    B, Lt, Lm = 1, 8, 12
    mel = rng.standard_normal((1, 100, 33)).astype(np.float32)
    text = rng.integers(2, 50, (B, Lt)).astype(np.int64)
    codes = rng.integers(0, 64, (B, Lm)).astype(np.int64)
    wav_len = (Lm - 2) * cfg.mel_length_compression  # codes_len = Lm-1
    with torch.no_grad():
        want = ref(
            torch.from_numpy(mel),
            torch.from_numpy(text),
            torch.tensor([Lt]),
            torch.from_numpy(codes),
            torch.tensor([wav_len]),
            cond_mel_lengths=torch.tensor([33]),
            return_latent=True,
            clip_inputs=False,
        ).numpy()
    got = np.asarray(
        model.apply(
            params,
            jnp.asarray(mel.transpose(0, 2, 1)),
            jnp.asarray([33]),
            jnp.asarray(text, jnp.int32),
            jnp.asarray([Lt]),
            jnp.asarray(codes, jnp.int32),
            jnp.asarray([wav_len]),
            method=UnifiedVoiceV1.forward_latent,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_v1_greedy_decode_parity(v1_pair, rng):
    ref, model, params, cfg = v1_pair
    ref.post_init_gpt2_config(use_deepspeed=False, kv_cache=True, half=False)
    B, Lt = 1, 6
    mel = rng.standard_normal((1, 100, 29)).astype(np.float32)
    text = rng.integers(2, 50, (B, Lt)).astype(np.int64)
    max_new = 20
    with torch.no_grad():
        want = ref.inference_speech(
            torch.from_numpy(mel),
            torch.from_numpy(text),
            cond_mel_lengths=torch.tensor([29]),
            do_sample=False,
            num_beams=1,
            max_generate_length=max_new,
        ).numpy()[0]
    conds = model.apply(
        params, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray([29]),
        method=UnifiedVoiceV1.get_conditioning,
    )
    dec = GPTDecoder(
        model, cfg, SamplingConfig(do_sample=False, use_repetition_penalty=False)
    )
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([Lt]), bucket=Lt)
    res = dec.generate(
        params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        jax.random.PRNGKey(0), max_new=max_new,
    )
    got = np.asarray(res.codes)[0]
    np.testing.assert_array_equal(got[: want.shape[0]], want)


def test_ecapa_parity(rng):
    torch.manual_seed(9)
    em = import_reference("indextts.BigVGAN.ECAPA_TDNN")
    ref = em.ECAPA_TDNN(
        input_size=24, lin_neurons=32,
        channels=[32, 32, 32, 32, 96], kernel_sizes=[5, 3, 3, 3, 1],
        dilations=[1, 2, 3, 4, 1], attention_channels=16, res2net_scale=8,
        se_channels=16,
    ).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    model = ECAPA_TDNN(
        input_size=24, lin_neurons=32, channels=(32, 32, 32, 32, 96),
        attention_channels=16, res2net_scale=8, se_channels=16,
    )
    params = {"params": tc.convert_ecapa(tc.to_numpy_sd(ref.state_dict()))}
    x = rng.standard_normal((2, 50, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-2)


BV1_TINY = BigVGANv1Config(
    gpt_dim=48,
    num_mels=24,
    upsample_rates=(4, 2, 2),
    upsample_kernel_sizes=(8, 4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    # v1 AMPBlock1 hardcodes 3 dilation taps (BigVGAN/models.py:24-34)
    resblock_dilation_sizes=((1, 3, 5),),
    speaker_embedding_dim=32,
    ecapa_channels=(32, 32, 32, 32, 96),
    ecapa_attention_channels=16,
    ecapa_se_channels=16,
)


def test_bigvgan_v1_parity(rng):
    torch.manual_seed(17)
    bv = import_reference("indextts.BigVGAN.models")

    class H(dict):
        def __getattr__(self, k):
            return self[k]

    h = H(
        gpt_dim=BV1_TINY.gpt_dim,
        num_mels=BV1_TINY.num_mels,
        upsample_rates=list(BV1_TINY.upsample_rates),
        upsample_kernel_sizes=list(BV1_TINY.upsample_kernel_sizes),
        upsample_initial_channel=BV1_TINY.upsample_initial_channel,
        resblock_kernel_sizes=list(BV1_TINY.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in BV1_TINY.resblock_dilation_sizes],
        resblock="1",
        activation="snakebeta",
        snake_logscale=True,
        feat_upsample=True,
        cond_d_vector_in_each_upsampling_layer=True,
        speaker_embedding_dim=BV1_TINY.speaker_embedding_dim,
    )
    # reference ECAPA defaults are big; shrink via monkeypatched ctor args
    import indextts.BigVGAN.models as models_mod

    orig = models_mod.ECAPA_TDNN

    def small_ecapa(input_size, lin_neurons=192):
        return orig(
            input_size=input_size, lin_neurons=lin_neurons,
            channels=[32, 32, 32, 32, 96], kernel_sizes=[5, 3, 3, 3, 1],
            dilations=[1, 2, 3, 4, 1], attention_channels=16, res2net_scale=8,
            se_channels=16,
        )

    models_mod.ECAPA_TDNN = small_ecapa
    try:
        ref = bv.BigVGAN(h, use_cuda_kernel=False)
    finally:
        models_mod.ECAPA_TDNN = orig
    ref.remove_weight_norm()
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)

    import dataclasses

    model = BigVGANv1(BV1_TINY)
    sd = tc.to_numpy_sd(ref.state_dict())
    params = {"params": tc.convert_bigvgan_v1(sd, BV1_TINY)}
    # patch ECAPA shape constants in our model via config
    object.__setattr__  # noqa: B018

    latent = rng.standard_normal((1, 9, BV1_TINY.gpt_dim)).astype(np.float32)
    mel_ref = rng.standard_normal((1, 40, BV1_TINY.num_mels)).astype(np.float32)
    with torch.no_grad():
        # reference ECAPA takes (batch, time, channels) directly
        want, _ = ref(torch.from_numpy(latent), torch.from_numpy(mel_ref))
    want = want.numpy()[:, 0]
    got = np.asarray(model.apply(params, jnp.asarray(latent), jnp.asarray(mel_ref)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-2)


def test_dvae_codes_parity(rng):
    torch.manual_seed(23)
    dv = import_reference("indextts.vqvae.xtts_dvae")
    cfg = DVAEConfig(
        channels=16, num_tokens=64, codebook_dim=32, hidden_dim=24,
        num_layers=2, num_resnet_blocks=2, kernel_size=3, stride=2,
    )
    ref = dv.DiscreteVAE(
        positional_dims=1, num_tokens=cfg.num_tokens, codebook_dim=cfg.codebook_dim,
        num_layers=cfg.num_layers, num_resnet_blocks=cfg.num_resnet_blocks,
        hidden_dim=cfg.hidden_dim, channels=cfg.channels, stride=cfg.stride,
        kernel_size=cfg.kernel_size, use_transposed_convs=True,
        activation="relu",
    ).eval()
    model = DVAE(cfg)
    params = {"params": tc.convert_dvae(tc.to_numpy_sd(ref.state_dict()), cfg)}
    mel = rng.standard_normal((2, 16, 40)).astype(np.float32)  # (B, mel, T)
    with torch.no_grad():
        want = ref.get_codebook_indices(torch.from_numpy(mel)).numpy()
    got = np.asarray(
        model.apply(
            params, jnp.asarray(mel.transpose(0, 2, 1)),
            method=DVAE.get_codebook_indices,
        )
    )
    np.testing.assert_array_equal(got, want)
