"""Composed end-to-end golden test: the reference's IndexTTS2.infer_generator
(torch, random tiny weights) vs our engine.infer on the SAME converted
checkpoint, same prompt audio, same text tokens, greedy decode, injected CFM
noise — asserting mel allclose before the vocoder and waveform allclose after.

This is the integration-seam test VERDICT r1 asked for: it exercises the
composition resample -> feature-extract -> w2v-BERT -> RepCodec quantize ->
CAMPPlus -> regulator(prompt) -> AR decode -> stop-trim -> latent ->
gpt_layer + vq2emb -> regulator(1.72x) -> prompt-condition concat -> CFM with
prompt-mel pinning -> trim -> BigVGAN -> interval silence
(infer_v2.py:569-937).

Shims (each individually parity-tested elsewhere, so shimming them here does
not lose coverage): torchaudio.Resample/kaldi.fbank use our DSP on both
sides; get_emb's hidden_states[17] tap is rebound to the tiny model's tap
layer; the tokenizer is a shared fake (front-end has its own test corpus);
torch.randn inside CFM is intercepted and the same noise fed to our engine.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import import_reference, install_stubs  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from indextts_tpu.config import (  # noqa: E402
    BigVGANConfig,
    CampPlusConfig,
    ConditionModuleConfig,
    DiTConfig,
    GPTConfig,
    IndexTTS2Config,
    LengthRegulatorConfig,
    RuntimeConfig,
    S2MelConfig,
    SemanticCodecConfig,
    W2VBertConfig,
    WaveNetConfig,
)
from indextts_tpu.frontend import features as feat  # noqa: E402
from indextts_tpu.runtime import torch_convert as tc  # noqa: E402
from indextts_tpu.runtime.engine import IndexTTS2Engine  # noqa: E402
from indextts_tpu.utils import audio as audio_utils  # noqa: E402


class AD(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


# one coherent tiny architecture shared by both stacks --------------------
GPT_KW = dict(
    layers=2, model_dim=64, heads=4, max_text_tokens=40, max_mel_tokens=60,
    number_text_tokens=50, number_mel_codes=66, start_mel_token=64,
    stop_mel_token=65, start_text_token=0, stop_text_token=1,
    condition_type="conformer_perceiver",
    condition_module=dict(output_size=32, linear_units=48, attention_heads=4,
                          num_blocks=1, input_layer="conv2d2", perceiver_mult=2),
    emo_condition_module=dict(output_size=32, linear_units=32,
                              attention_heads=2, num_blocks=1,
                              input_layer="conv2d2", perceiver_mult=2),
)
W2V_HID = 1024  # the reference UnifiedVoice conditioning input is 1024-d
TAP = 2
CODEC = dict(codebook_size=66, hidden_size=W2V_HID, codebook_dim=8,
             vocos_dim=24, vocos_intermediate_dim=32, vocos_num_layers=1)
LR_CH, DIT_HID, DIT_DEPTH, STYLE = 32, 32, 3, 192
WN_LAYERS = 2
VOC = BigVGANConfig(
    num_mels=80, upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
    upsample_initial_channel=16, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


def our_config() -> IndexTTS2Config:
    return IndexTTS2Config(
        gpt=GPTConfig(
            model_dim=64, layers=2, heads=4, max_mel_tokens=60,
            max_text_tokens=40, number_text_tokens=50, number_mel_codes=66,
            start_mel_token=64, stop_mel_token=65,
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=48, attention_heads=4, num_blocks=1
            ),
            emo_condition_module=ConditionModuleConfig(
                output_size=32, linear_units=32, attention_heads=2, num_blocks=1
            ),
        ),
        semantic_codec=SemanticCodecConfig(**CODEC),
        s2mel=S2MelConfig(
            length_regulator=LengthRegulatorConfig(
                channels=LR_CH, in_channels=W2V_HID, sampling_ratios=(1, 1)
            ),
            dit=DiTConfig(hidden_dim=DIT_HID, num_heads=4, depth=DIT_DEPTH,
                          in_channels=80, content_dim=LR_CH, style_dim=STYLE),
            wavenet=WaveNetConfig(hidden_dim=DIT_HID, num_layers=WN_LAYERS,
                                  kernel_size=5),
            gpt_dims=(64, 16, 8, W2V_HID),
        ),
        vocoder=VOC,
        w2vbert=W2VBertConfig(
            hidden_size=W2V_HID, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, tap_layer=TAP, conv_depthwise_kernel_size=7,
        ),
        campplus=CampPlusConfig(),
        runtime=RuntimeConfig(
            # top_k=1 makes the multinomial draw deterministic (argmax after
            # repetition penalty), matching the reference call with top_k=1 —
            # its HF path hardcodes do_sample=True (infer_v2.py:767), so
            # true greedy is unreachable there
            # remove_long_silence keeps its default (False): the reference v2
            # live path only stop-trims, so the default is already parity
            diffusion_steps=2, max_mel_tokens=24, do_sample=True, num_beams=1,
            top_k=1,
        ),
    )


def _patch_torchaudio():
    """Make the reference's torchaudio calls run our DSP (both stacks then
    consume identical features; the DSP itself has its own parity tests)."""
    ta = sys.modules["torchaudio"]

    class Resample:
        def __init__(self, sr_in, sr_out):
            self.sr_in, self.sr_out = sr_in, sr_out

        def __call__(self, audio):
            out = audio_utils.resample(audio.numpy()[0], self.sr_in, self.sr_out)
            return torch.from_numpy(out[None].copy())

    def fbank(audio, num_mel_bins=80, dither=0, sample_frequency=16000):
        return torch.from_numpy(
            feat.campplus_fbank(audio.numpy()[0]).astype(np.float32)
        )

    ta.transforms = types.SimpleNamespace(Resample=Resample)
    ta.compliance = types.SimpleNamespace(
        kaldi=types.SimpleNamespace(fbank=fbank)
    )


class FakeTokenizer:
    unk_token_id = -1

    def tokenize(self, text):
        return list(text)

    def split_segments(self, pieces, max_tokens, quick_streaming_tokens=0):
        # two fixed segments so interval-silence insertion is exercised
        half = max(1, len(pieces) // 2)
        return [pieces[:half], pieces[half:]]

    def convert_tokens_to_ids(self, toks):
        return [2 + (ord(t) % 46) for t in toks]

    def convert_ids_to_tokens(self, ids):
        return ["?" for _ in ids]


@pytest.fixture(scope="module")
def stacks():
    torch.manual_seed(0)
    install_stubs()
    _patch_torchaudio()

    # ---- torch reference modules ----
    mv2 = import_reference("indextts.gpt.model_v2")
    ref_gpt = mv2.UnifiedVoice(**GPT_KW, use_accel=False).eval()
    ref_gpt.post_init_gpt2_config(use_deepspeed=False, kv_cache=True, half=False)

    rm = import_reference("indextts.utils.maskgct.models.codec.kmeans.repcodec_model")
    ref_codec = rm.RepCodec(**CODEC).eval()

    from transformers import (
        SeamlessM4TFeatureExtractor,
        Wav2Vec2BertConfig,
        Wav2Vec2BertModel,
    )

    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=W2V_HID, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, feature_projection_input_dim=160,
        conv_depthwise_kernel_size=7, position_embeddings_type="relative_key",
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, conformer_conv_dropout=0.0, layerdrop=0.0,
    )
    ref_w2v = Wav2Vec2BertModel(hf_cfg).eval()

    dt = import_reference("indextts.s2mel.modules.campplus.DTDNN")
    ref_camp = dt.CAMPPlus(feat_dim=80, embedding_size=STYLE).eval()

    fm = import_reference("indextts.s2mel.modules.flow_matching")
    lr_mod = import_reference("indextts.s2mel.modules.length_regulator")
    s2_args = AD(
        dit_type="DiT", reg_loss_type="l1", style_encoder=AD(dim=STYLE),
        length_regulator=AD(channels=LR_CH, is_discrete=False,
                            in_channels=W2V_HID, content_codebook_size=32,
                            sampling_ratios=[1, 1], vector_quantize=False,
                            n_codebooks=1, quantizer_dropout=0.0,
                            f0_condition=False, n_f0_bins=8),
        DiT=AD(hidden_dim=DIT_HID, num_heads=4, depth=DIT_DEPTH,
               class_dropout_prob=0.1, block_size=1024, in_channels=80,
               style_condition=True, final_layer_type="wavenet", target="mel",
               content_dim=LR_CH, content_codebook_size=16,
               content_type="discrete", f0_condition=False, n_f0_bins=8,
               content_codebooks=1, is_causal=False, long_skip_connection=True,
               zero_prompt_speech_token=False, time_as_token=False,
               style_as_token=False, uvit_skip_connection=True,
               add_resblock_in_transformer=False),
        wavenet=AD(hidden_dim=DIT_HID, num_layers=WN_LAYERS, kernel_size=5,
                   dilation_rate=1, p_dropout=0.0, style_condition=True),
    )
    ref_cfm = fm.CFM(s2_args).eval()
    ref_cfm.estimator.setup_caches(max_batch_size=1, max_seq_length=2048)
    ref_lr = lr_mod.InterpolateRegulator(
        channels=LR_CH, sampling_ratios=(1, 1), is_discrete=False,
        in_channels=W2V_HID, codebook_size=32,
    ).eval()
    ref_gpt_layer = torch.nn.Sequential(
        torch.nn.Linear(64, 16), torch.nn.Linear(16, 8),
        torch.nn.Linear(8, W2V_HID),
    ).eval()

    bv = import_reference("indextts.s2mel.modules.bigvgan.bigvgan")
    h = AD(
        num_mels=VOC.num_mels, upsample_rates=list(VOC.upsample_rates),
        upsample_kernel_sizes=list(VOC.upsample_kernel_sizes),
        upsample_initial_channel=VOC.upsample_initial_channel,
        resblock_kernel_sizes=list(VOC.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in VOC.resblock_dilation_sizes],
        resblock="1", activation="snakebeta", snake_logscale=True,
        use_bias_at_final=False, use_tanh_at_final=False,
    )
    ref_voc = bv.BigVGAN(h, use_cuda_kernel=False)
    ref_voc.remove_weight_norm()
    ref_voc.eval()

    # ---- the assembled reference engine (bypassing __init__'s IO) ----
    iv2 = import_reference("indextts.infer_v2")
    audio_mod = import_reference("indextts.s2mel.modules.audio")
    ref = iv2.IndexTTS2.__new__(iv2.IndexTTS2)
    ref.device = "cpu"
    ref.dtype = None
    ref.use_accel = False
    ref._use_int8 = False
    ref._use_cpu_offload = False
    ref.stop_mel_token = GPT_KW["stop_mel_token"]
    ref.gpt = ref_gpt
    ref.semantic_model = ref_w2v
    ref.semantic_codec = ref_codec
    ref.campplus_model = ref_camp
    ref.bigvgan = ref_voc
    ref.s2mel = types.SimpleNamespace(models={
        "cfm": ref_cfm, "length_regulator": ref_lr, "gpt_layer": ref_gpt_layer,
    })
    rngs = np.random.default_rng(17)
    sem_mean = rngs.standard_normal(W2V_HID).astype(np.float32) * 0.1
    sem_std = (rngs.random(W2V_HID).astype(np.float32) * 0.5 + 0.75)
    ref.semantic_mean = torch.from_numpy(sem_mean)
    ref.semantic_std = torch.from_numpy(sem_std)
    ref.extract_features = SeamlessM4TFeatureExtractor()
    mel_fn_args = dict(n_fft=1024, win_size=1024, hop_size=256, num_mels=80,
                       sampling_rate=22050, fmin=0, fmax=None, center=False)
    ref.mel_fn = lambda x: audio_mod.mel_spectrogram(x, **mel_fn_args)
    ref.tokenizer = FakeTokenizer()
    ref.gr_progress = None
    ref._diffusion_steps = 2
    ref._cfg_rate = 0.7
    ref.cache_spk_cond = None
    ref.cache_emo_cond = None
    ref.cache_spk_audio_prompt = None
    ref.cache_emo_audio_prompt = None
    ref.cache_s2mel_style = None
    ref.cache_s2mel_prompt = None
    ref.cache_mel = None

    # tiny model taps layer TAP, not the full model's 17 (tap semantics have
    # their own parity test)
    def get_emb(input_features, attention_mask):
        with torch.no_grad():
            out = ref.semantic_model(
                input_features=input_features, attention_mask=attention_mask,
                output_hidden_states=True,
            )
        f = out.hidden_states[TAP]
        return (f - ref.semantic_mean) / ref.semantic_std

    ref.get_emb = get_emb

    prompt = (np.random.default_rng(4).standard_normal(16000) * 0.1).astype(
        np.float32
    )

    def load_and_cut(audio_path, max_len_s, verbose=False, sr=None):
        return torch.from_numpy(prompt[None].copy()), 16000

    ref._load_and_cut_audio = load_and_cut

    # ---- our engine from the converted weights ----
    cfg = our_config()
    net = {
        "cfm": tc.to_numpy_sd(ref_cfm.state_dict()),
        "length_regulator": tc.to_numpy_sd(ref_lr.state_dict()),
        "gpt_layer": tc.to_numpy_sd(ref_gpt_layer.state_dict()),
    }
    params = {
        "gpt": tc.convert_unified_voice(tc.to_numpy_sd(ref_gpt.state_dict()), cfg.gpt),
        "s2mel": tc.convert_s2mel(net, depth=DIT_DEPTH, wn_layers=WN_LAYERS,
                                  n_ratios=2),
        "bigvgan": tc.convert_bigvgan(tc.to_numpy_sd(ref_voc.state_dict()), VOC),
        "repcodec": tc.convert_repcodec(tc.to_numpy_sd(ref_codec.state_dict()),
                                        cfg.semantic_codec),
        "campplus": tc.convert_campplus(tc.to_numpy_sd(ref_camp.state_dict()),
                                        cfg.campplus),
        "w2vbert": tc.convert_w2vbert(tc.to_numpy_sd(ref_w2v.state_dict()),
                                      cfg.w2vbert),
    }
    engine = IndexTTS2Engine(
        cfg, params, precise_shapes=True, semantic_stats=(sem_mean, sem_std),
    )
    return ref, engine, prompt


def test_composed_pipeline_matches_reference(stacks):
    ref, engine, prompt = stacks
    text = "hello composed pipeline"

    # intercept the reference's CFM noise (torch.randn, flow_matching.py:52)
    noise_rng = np.random.default_rng(99)
    noises = []
    orig_randn = torch.randn

    def fake_randn(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (list, tuple)):
            shape = tuple(shape[0])
        arr = noise_rng.standard_normal(shape).astype(np.float32)
        noises.append(arr)
        return torch.from_numpy(arr)

    ref_mels = []
    orig_voc_fwd = ref.bigvgan.forward

    def rec_voc(x):
        ref_mels.append(x.detach().numpy().copy())
        return orig_voc_fwd(x)

    torch.randn = fake_randn
    ref.bigvgan.forward = rec_voc
    try:
        gen = ref.infer_generator(
            spk_audio_prompt="<prompt>", text=text, output_path=None,
            return_audio=True, return_numpy=True, verbose=False,
            num_beams=1, top_k=1, max_mel_tokens=24,
            interval_silence=200,
        )
        result = list(gen)[-1]
    finally:
        torch.randn = orig_randn
        ref.bigvgan.forward = orig_voc_fwd

    want_wav = np.asarray(result.audio, np.float32)  # int16-scale floats
    assert len(ref_mels) == 2 and len(noises) == 2

    # ---- our engine on the same inputs with the same noise ----
    tok = FakeTokenizer()
    pieces = tok.tokenize(text)
    segs = tok.split_segments(pieces, 120)
    seg_ids = [np.asarray(tok.convert_tokens_to_ids(s), np.int32) for s in segs]

    noise_iter = iter(noises)

    def noise_hook(shape):
        n = next(noise_iter)
        assert n.shape == shape, (n.shape, shape)
        return n

    engine._noise_hook = noise_hook
    engine._mel_taps = []
    try:
        out = engine.infer((prompt, 16000), seg_ids, seed=0,
                           interval_silence=200, do_sample=True, num_beams=1,
                           max_mel_tokens=24)
    finally:
        engine._noise_hook = None

    # mel before the vocoder, per segment
    assert len(engine._mel_taps) == 2
    for got_mel, want_mel in zip(engine._mel_taps, ref_mels):
        assert got_mel.shape == want_mel.shape
        np.testing.assert_allclose(got_mel, want_mel, atol=2e-3, rtol=1e-2)

    # waveform after the vocoder + interval silence, int16 scale + clamp
    got_wav = np.clip(out["audio"] * 32767.0, -32767.0, 32767.0)
    assert got_wav.shape == want_wav.shape, (got_wav.shape, want_wav.shape)
    np.testing.assert_allclose(got_wav, want_wav, atol=2.0)
