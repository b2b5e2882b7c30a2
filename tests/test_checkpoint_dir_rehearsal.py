"""Full-checkpoint-directory rehearsal (VERDICT r4 #5): synthesize a
COMPLETE reference-layout model_dir from the reference torch modules with
random weights — gpt.pth, s2mel.pth (state['net'] with DDP prefixes),
wav2vec2bert_stats.pt, feat1/feat2.pt, bpe.model, config.yaml and the hf/
content (w2v-bert safetensors, semantic codec safetensors, campplus bin,
weight-normed bigvgan generator) — then boot the engine purely through
runtime/loader.load_engine and synthesize.

This closes the gap that conversion was tested per-format but the whole
directory load order (reference: infer_v2.py:68-319, esp. :138-289) was only
exercised by the verify tool's schema diff. No real checkpoints exist in
this sandbox; the directory is the reference's own modules' state dicts.
"""

import json
import struct
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import import_reference  # noqa: E402
from test_engine_e2e import tiny_config  # noqa: E402

from indextts_tpu.runtime import torch_convert as tc  # noqa: E402


class AD(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


# minimal SentencePiece model protobuf (same encoding the tokenizer tests
# use): enough vocab to tokenize "hello. hello" with ids < 50
def _varint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece_msg(piece, score, ptype=1):
    pb = piece.encode("utf-8")
    body = b"\x0a" + _varint(len(pb)) + pb
    body += b"\x15" + struct.pack("<f", score)
    body += b"\x18" + _varint(ptype)
    return b"\x0a" + _varint(len(body)) + body


PIECES = [
    ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
    ("▁", -2.0, 1), ("h", -3.0, 1), ("e", -3.1, 1), ("l", -3.2, 1),
    ("o", -3.3, 1), ("he", -1.0, 1), ("ll", -1.2, 1), ("hello", -0.5, 1),
    ("▁hello", -0.4, 1), ("▁.", -1.5, 1), (".", -4.0, 1), (",", -4.1, 1),
]


def _ddp(sd):
    """Add DistributedDataParallel prefixes (commons.py:602-607 strips them
    at load; the rehearsal must exercise that)."""
    return {f"module.{k}": v for k, v in sd.items()}


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_ckpt_dir")
    cfg = tiny_config()

    # ---- gpt.pth: reference UnifiedVoice, tiny_config shapes ------------
    torch.manual_seed(40)
    mv2 = import_reference("indextts.gpt.model_v2")
    g = cfg.gpt
    ref_gpt = mv2.UnifiedVoice(
        layers=g.layers, model_dim=g.model_dim, heads=g.heads,
        max_text_tokens=g.max_text_tokens, max_mel_tokens=g.max_mel_tokens,
        number_text_tokens=g.number_text_tokens,
        number_mel_codes=g.number_mel_codes,
        start_mel_token=g.start_mel_token, stop_mel_token=g.stop_mel_token,
        condition_type="conformer_perceiver",
        condition_module=dict(
            output_size=32, linear_units=48, attention_heads=4, num_blocks=1,
            input_layer="conv2d2", perceiver_mult=2,
        ),
        emo_condition_module=dict(
            output_size=32, linear_units=32, attention_heads=2, num_blocks=1,
            input_layer="conv2d2", perceiver_mult=2,
        ),
        use_accel=False,
    ).eval()
    torch.save(ref_gpt.state_dict(), d / "gpt.pth")

    # ---- s2mel.pth: state['net'] multi-module dict with DDP prefixes ----
    fm = import_reference("indextts.s2mel.modules.flow_matching")
    lr_mod = import_reference("indextts.s2mel.modules.length_regulator")
    s = cfg.s2mel
    args = AD(
        dit_type="DiT", reg_loss_type="l1",
        style_encoder=AD(dim=s.dit.style_dim),
        length_regulator=AD(
            channels=s.length_regulator.channels, is_discrete=False,
            in_channels=s.length_regulator.in_channels,
            content_codebook_size=32,
            sampling_ratios=list(s.length_regulator.sampling_ratios),
            vector_quantize=False, n_codebooks=1, quantizer_dropout=0.0,
            f0_condition=False, n_f0_bins=8,
        ),
        DiT=AD(
            hidden_dim=s.dit.hidden_dim, num_heads=s.dit.num_heads,
            depth=s.dit.depth, class_dropout_prob=0.1, block_size=1024,
            in_channels=s.dit.in_channels, style_condition=True,
            final_layer_type="wavenet", target="mel",
            content_dim=s.dit.content_dim, content_codebook_size=16,
            content_type="discrete", f0_condition=False, n_f0_bins=8,
            content_codebooks=1, is_causal=False, long_skip_connection=True,
            zero_prompt_speech_token=False, time_as_token=False,
            style_as_token=False, uvit_skip_connection=True,
            add_resblock_in_transformer=False,
        ),
        wavenet=AD(
            hidden_dim=s.wavenet.hidden_dim, num_layers=s.wavenet.num_layers,
            kernel_size=s.wavenet.kernel_size, dilation_rate=1,
            p_dropout=0.0, style_condition=True,
        ),
    )
    cfm = fm.CFM(args).eval()
    lr = lr_mod.InterpolateRegulator(
        channels=s.length_regulator.channels,
        sampling_ratios=tuple(s.length_regulator.sampling_ratios),
        is_discrete=False, in_channels=s.length_regulator.in_channels,
        codebook_size=32,
    ).eval()
    d0, d1, d2, d3 = s.gpt_dims
    gpt_layer = torch.nn.Sequential(
        torch.nn.Linear(d0, d1), torch.nn.Linear(d1, d2),
        torch.nn.Linear(d2, d3),
    ).eval()
    torch.save(
        {"net": {
            "cfm": _ddp(cfm.state_dict()),
            "length_regulator": _ddp(lr.state_dict()),
            "gpt_layer": _ddp(gpt_layer.state_dict()),
        }},
        d / "s2mel.pth",
    )

    # ---- stats + emotion/speaker matrices -------------------------------
    w = cfg.w2vbert.hidden_size
    torch.save(
        {"mean": torch.randn(w), "std": torch.rand(w) + 0.5},
        d / "wav2vec2bert_stats.pt",
    )
    n_emo = sum(cfg.emo_num)
    torch.save(torch.randn(n_emo, 192), d / "feat1.pt")           # spk
    torch.save(torch.randn(n_emo, g.model_dim), d / "feat2.pt")   # emo

    # ---- bpe.model ------------------------------------------------------
    (d / "bpe.model").write_bytes(
        b"".join(_piece_msg(p, sc, t) for p, sc, t in PIECES)
    )

    # ---- config.yaml (reference structure; covers the sections the yaml
    # path expresses: gpt / semantic_codec / s2mel / emo_num) -------------
    import yaml

    (d / "config.yaml").write_text(yaml.safe_dump({
        "gpt": {
            "layers": g.layers, "model_dim": g.model_dim, "heads": g.heads,
            "max_text_tokens": g.max_text_tokens,
            "max_mel_tokens": g.max_mel_tokens,
            "number_text_tokens": g.number_text_tokens,
            "number_mel_codes": g.number_mel_codes,
            "start_mel_token": g.start_mel_token,
            "stop_mel_token": g.stop_mel_token,
            "condition_module": {
                "output_size": 32, "linear_units": 48,
                "attention_heads": 4, "num_blocks": 1,
            },
            "emo_condition_module": {
                "output_size": 32, "linear_units": 32,
                "attention_heads": 2, "num_blocks": 1,
            },
        },
        "semantic_codec": {
            "codebook_size": cfg.semantic_codec.codebook_size,
            "hidden_size": cfg.semantic_codec.hidden_size,
            "codebook_dim": cfg.semantic_codec.codebook_dim,
            "vocos_dim": cfg.semantic_codec.vocos_dim,
            "vocos_intermediate_dim": cfg.semantic_codec.vocos_intermediate_dim,
            "vocos_num_layers": cfg.semantic_codec.vocos_num_layers,
        },
        "s2mel": {
            "style_encoder": {"dim": s.dit.style_dim},
            "length_regulator": {
                "channels": s.length_regulator.channels,
                "in_channels": s.length_regulator.in_channels,
                "sampling_ratios": list(s.length_regulator.sampling_ratios),
            },
            "DiT": {
                "hidden_dim": s.dit.hidden_dim,
                "num_heads": s.dit.num_heads, "depth": s.dit.depth,
                "in_channels": s.dit.in_channels,
                "content_dim": s.dit.content_dim,
            },
            "wavenet": {
                "hidden_dim": s.wavenet.hidden_dim,
                "num_layers": s.wavenet.num_layers,
                "kernel_size": s.wavenet.kernel_size,
            },
        },
        "emo_num": list(cfg.emo_num),
        "version": "2.0",
    }))

    # ---- hf/ content ----------------------------------------------------
    hf = d / "hf"
    hf.mkdir()

    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    wcfg = cfg.w2vbert
    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=wcfg.hidden_size,
        num_hidden_layers=wcfg.num_hidden_layers,
        num_attention_heads=wcfg.num_attention_heads,
        intermediate_size=wcfg.intermediate_size,
        feature_projection_input_dim=wcfg.feature_projection_input_dim,
        conv_depthwise_kernel_size=wcfg.conv_depthwise_kernel_size,
        left_max_position_embeddings=wcfg.left_max_position_embeddings,
        right_max_position_embeddings=wcfg.right_max_position_embeddings,
        position_embeddings_type="relative_key",
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, conformer_conv_dropout=0.0, layerdrop=0.0,
    )
    ref_w2v = Wav2Vec2BertModel(hf_cfg).eval()
    from safetensors.numpy import save_file

    (hf / "w2v-bert-2.0").mkdir()
    save_file(tc.to_numpy_sd(ref_w2v.state_dict()),
              str(hf / "w2v-bert-2.0" / "model.safetensors"))

    rm = import_reference("indextts.utils.maskgct.models.codec.kmeans.repcodec_model")
    c = cfg.semantic_codec
    ref_codec = rm.RepCodec(
        codebook_size=c.codebook_size, hidden_size=c.hidden_size,
        codebook_dim=c.codebook_dim, vocos_dim=c.vocos_dim,
        vocos_intermediate_dim=c.vocos_intermediate_dim,
        vocos_num_layers=c.vocos_num_layers,
    ).eval()
    save_file(tc.to_numpy_sd(ref_codec.state_dict()),
              str(hf / "semantic_codec.safetensors"))

    dt = import_reference("indextts.s2mel.modules.campplus.DTDNN")
    ref_camp = dt.CAMPPlus(feat_dim=cfg.campplus.feat_dim,
                           embedding_size=cfg.campplus.embedding_size).eval()
    torch.save(ref_camp.state_dict(), hf / "campplus_cn_common.bin")

    bv = import_reference("indextts.s2mel.modules.bigvgan.bigvgan")
    v = cfg.vocoder
    h = AD(
        num_mels=v.num_mels, upsample_rates=list(v.upsample_rates),
        upsample_kernel_sizes=list(v.upsample_kernel_sizes),
        upsample_initial_channel=v.upsample_initial_channel,
        resblock_kernel_sizes=list(v.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(x) for x in v.resblock_dilation_sizes],
        resblock="1", activation="snakebeta", snake_logscale=True,
        use_bias_at_final=False, use_tanh_at_final=False,
    )
    ref_voc = bv.BigVGAN(h, use_cuda_kernel=False).eval()
    # saved WEIGHT-NORMED (weight_g/weight_v), as shipped checkpoints are;
    # the converter must fold (reference folds at load, infer_v2.py:263)
    torch.save({"generator": ref_voc.state_dict()}, hf / "bigvgan_generator.pt")

    return d, cfg, ref_gpt


def test_whole_directory_boots_and_synthesizes(model_dir, rng, tmp_path):
    from indextts_tpu.runtime.loader import load_engine
    from indextts_tpu.utils.audio import save_wav

    d, cfg, ref_gpt = model_dir
    engine = load_engine(str(d), cfg=cfg)

    # every component came from the directory, not the random filler
    k = engine.p_gpt["gpt"]["h_0"]["attn"]["c_attn"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(k), ref_gpt.state_dict()["gpt.h.0.attn.c_attn.weight"].numpy()
    )
    # emo/spk matrices were split by emo_num groups
    assert len(engine.emo_matrix) == len(cfg.emo_num)
    assert sum(m.shape[0] for m in engine.emo_matrix) == sum(cfg.emo_num)
    assert engine.emo_matrix[0].shape[1] == cfg.gpt.model_dim
    # semantic stats are the saved ones, not identity
    assert float(np.abs(np.asarray(engine.semantic_mean)).sum()) > 0

    # tokenizer built from bpe.model; full text-level synthesis
    assert engine.tokenizer is not None
    prompt = tmp_path / "spk.wav"
    save_wav(str(prompt),
             (rng.standard_normal(16000) * 0.1).astype(np.float32), 16000)
    out = engine.infer_text(str(prompt), "hello. hello", seed=0)
    wav = out["audio"]
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()

    # the converted tree was cached natively (Orbax) for torch-free reloads
    assert (d / "jax_cache" / "params").exists()


def test_native_cache_reload_matches(model_dir):
    """Second load restores the Orbax cache (no torch conversion) and gets
    byte-identical params + aux."""
    from indextts_tpu.runtime import loader

    d, cfg, ref_gpt = model_dir
    assert (d / "jax_cache" / "params").exists()
    called = {"n": 0}
    orig = loader.convert_reference_checkpoints

    def counting(*a, **k):
        called["n"] += 1
        return orig(*a, **k)

    loader.convert_reference_checkpoints = counting
    try:
        engine = loader.load_engine(str(d), cfg=cfg)
    finally:
        loader.convert_reference_checkpoints = orig
    assert called["n"] == 0, "cache hit must skip torch conversion"
    np.testing.assert_array_equal(
        np.asarray(engine.p_gpt["gpt"]["h_0"]["attn"]["c_attn"]["kernel"]),
        ref_gpt.state_dict()["gpt.h.0.attn.c_attn.weight"].numpy(),
    )


def test_config_yaml_sections_parse_to_engine_values(model_dir):
    """The reference-style config.yaml written into the directory parses to
    the same gpt/semantic_codec/s2mel/emo_num values the engine ran with
    (the sections config.yaml can express; vocoder/w2vbert/campplus come
    from their own HF checkpoints in the reference)."""
    from indextts_tpu.config import load_config

    d, cfg, _ = model_dir
    parsed = load_config(str(d / "config.yaml"))
    assert parsed.gpt.model_dim == cfg.gpt.model_dim
    assert parsed.gpt.number_mel_codes == cfg.gpt.number_mel_codes
    assert parsed.gpt.condition_module == cfg.gpt.condition_module
    assert parsed.semantic_codec == cfg.semantic_codec
    assert parsed.s2mel.dit.depth == cfg.s2mel.dit.depth
    assert parsed.s2mel.wavenet.num_layers == cfg.s2mel.wavenet.num_layers
    assert parsed.emo_num == cfg.emo_num
