"""PyTorch checkpoint -> flax params conversion.

Handles the reference's four checkpoint flavors (SURVEY.md §5):
  1. strict .pth for the GPT (utils/checkpoint.py:25-36)
  2. multi-module state["net"] for s2mel (commons.py:579-635)
  3. HF safetensors (semantic codec)
  4. HF from_pretrained state dicts (BigVGAN, w2v-BERT, CAMPPlus)

All converters take a flat {name: numpy array} dict (load the torch file
however you like — torch.load on CPU, safetensors, etc.) and emit a flax
params pytree matching our module definitions.

Layout rules:
  torch nn.Linear weight (out, in)   -> Dense kernel (in, out)  [transpose]
  HF GPT-2 Conv1D weight (in, out)   -> Conv1D kernel (in, out) [as-is]
  torch nn.Conv1d weight (O, I, K)   -> flax Conv kernel (K, I, O)
  torch nn.Conv2d weight (O, I, H, W)-> flax Conv kernel (H, W, I, O)
  torch nn.ConvTranspose1d (I, O, K) -> handled per-module
  torch LayerNorm weight/bias        -> scale/bias
  torch nn.Embedding weight          -> embedding
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from indextts_tpu.config import GPTConfig


Array = np.ndarray
SD = Dict[str, Array]


def _t(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def linear(sd: SD, p: str) -> dict:
    out = {"kernel": _t(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def conv1d_as_dense(sd: SD, p: str) -> dict:
    """torch Conv1d with kernel_size=1 used as a pointwise projection."""
    w = sd[f"{p}.weight"]  # (O, I, 1)
    out = {"kernel": _t(w[:, :, 0])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def conv1d(sd: SD, p: str) -> dict:
    w = sd[f"{p}.weight"]  # (O, I, K)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def depthwise_conv1d(sd: SD, p: str) -> dict:
    w = sd[f"{p}.weight"]  # (C, 1, K), groups=C
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}  # (K, 1, C)
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def conv2d(sd: SD, p: str) -> dict:
    w = sd[f"{p}.weight"]  # (O, I, H, W)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def layernorm(sd: SD, p: str) -> dict:
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def embedding(sd: SD, p: str) -> dict:
    return {"embedding": sd[f"{p}.weight"]}


def gpt2_conv1d(sd: SD, p: str) -> dict:
    """HF GPT-2 Conv1D: weight already (in, out)."""
    return {"kernel": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


# ---------------------------------------------------------------------------
# Conformer + perceiver
# ---------------------------------------------------------------------------


def convert_conformer(sd: SD, prefix: str, num_blocks: int) -> dict:
    p = {}
    p["embed"] = {
        "conv": conv2d(sd, f"{prefix}.embed.conv.0"),
        "out": linear(sd, f"{prefix}.embed.out.0"),
    }
    for i in range(num_blocks):
        b = f"{prefix}.encoders.{i}"
        p[f"layer_{i}"] = {
            "self_attn": {
                "linear_q": linear(sd, f"{b}.self_attn.linear_q"),
                "linear_k": linear(sd, f"{b}.self_attn.linear_k"),
                "linear_v": linear(sd, f"{b}.self_attn.linear_v"),
                "linear_out": linear(sd, f"{b}.self_attn.linear_out"),
                "linear_pos": linear(sd, f"{b}.self_attn.linear_pos"),
                "pos_bias_u": sd[f"{b}.self_attn.pos_bias_u"],
                "pos_bias_v": sd[f"{b}.self_attn.pos_bias_v"],
            },
            "feed_forward": {
                "w_1": linear(sd, f"{b}.feed_forward.w_1"),
                "w_2": linear(sd, f"{b}.feed_forward.w_2"),
            },
            "conv_module": {
                "pointwise_conv1": conv1d_as_dense(sd, f"{b}.conv_module.pointwise_conv1"),
                "depthwise_conv": depthwise_conv1d(sd, f"{b}.conv_module.depthwise_conv"),
                "norm": layernorm(sd, f"{b}.conv_module.norm"),
                "pointwise_conv2": conv1d_as_dense(sd, f"{b}.conv_module.pointwise_conv2"),
            },
            "norm_mha": layernorm(sd, f"{b}.norm_mha"),
            "norm_conv": layernorm(sd, f"{b}.norm_conv"),
            "norm_ff": layernorm(sd, f"{b}.norm_ff"),
            "norm_final": layernorm(sd, f"{b}.norm_final"),
        }
    p["after_norm"] = layernorm(sd, f"{prefix}.after_norm")
    return p


def convert_perceiver(sd: SD, prefix: str, depth: int = 2, has_proj: bool = True) -> dict:
    p = {"latents": sd[f"{prefix}.latents"]}
    if has_proj and f"{prefix}.proj_context.weight" in sd:
        p["proj_context"] = linear(sd, f"{prefix}.proj_context")
    for i in range(depth):
        p[f"attn_{i}"] = {
            "to_q": linear(sd, f"{prefix}.layers.{i}.0.to_q"),
            "to_kv": linear(sd, f"{prefix}.layers.{i}.0.to_kv"),
            "to_out": linear(sd, f"{prefix}.layers.{i}.0.to_out"),
        }
        p[f"ff_{i}"] = {
            "proj_in": linear(sd, f"{prefix}.layers.{i}.1.0"),
            "proj_out": linear(sd, f"{prefix}.layers.{i}.1.2"),
        }
    p["norm"] = {"gamma": sd[f"{prefix}.norm.gamma"]}
    return p


# ---------------------------------------------------------------------------
# GPT-2 core + UnifiedVoice
# ---------------------------------------------------------------------------


def convert_gpt2_core(sd: SD, prefix: str, n_layer: int) -> dict:
    p = {}
    for i in range(n_layer):
        b = f"{prefix}.h.{i}"
        p[f"h_{i}"] = {
            "ln_1": layernorm(sd, f"{b}.ln_1"),
            "attn": {
                "c_attn": gpt2_conv1d(sd, f"{b}.attn.c_attn"),
                "c_proj": gpt2_conv1d(sd, f"{b}.attn.c_proj"),
            },
            "ln_2": layernorm(sd, f"{b}.ln_2"),
            "mlp": {
                "c_fc": gpt2_conv1d(sd, f"{b}.mlp.c_fc"),
                "c_proj": gpt2_conv1d(sd, f"{b}.mlp.c_proj"),
            },
        }
    p["ln_f"] = layernorm(sd, f"{prefix}.ln_f")
    return p


def convert_unified_voice(sd: SD, cfg: GPTConfig) -> dict:
    """Full UnifiedVoice state_dict (reference gpt.pth layout) -> flax params."""
    p = {
        "conditioning_encoder": convert_conformer(
            sd, "conditioning_encoder", cfg.condition_module.num_blocks
        ),
        "perceiver_encoder": convert_perceiver(sd, "perceiver_encoder"),
        "emo_conditioning_encoder": convert_conformer(
            sd, "emo_conditioning_encoder", cfg.emo_condition_module.num_blocks
        ),
        "emo_perceiver_encoder": convert_perceiver(sd, "emo_perceiver_encoder"),
        "text_embedding": embedding(sd, "text_embedding"),
        "mel_embedding": embedding(sd, "mel_embedding"),
        "mel_pos_embedding": {"embedding": sd["mel_pos_embedding.emb.weight"]},
        "text_pos_embedding": {"embedding": sd["text_pos_embedding.emb.weight"]},
        "speed_emb": embedding(sd, "speed_emb"),
        "emovec_layer": linear(sd, "emovec_layer"),
        "emo_layer": linear(sd, "emo_layer"),
        "final_norm": layernorm(sd, "final_norm"),
        "mel_head": linear(sd, "mel_head"),
        "text_head": linear(sd, "text_head"),
        "gpt": convert_gpt2_core(sd, "gpt", cfg.layers),
    }
    return p


def to_numpy_sd(torch_state_dict) -> SD:
    """torch state_dict -> {name: float32 numpy}."""
    out = {}
    for k, v in torch_state_dict.items():
        out[k] = v.detach().cpu().float().numpy()
    return out


# ---------------------------------------------------------------------------
# weight-norm folding (legacy torch.nn.utils.weight_norm: weight_g/weight_v)
# ---------------------------------------------------------------------------


def fold_weight_norm(sd: SD, p: str) -> Array:
    g = sd[f"{p}.weight_g"]
    v = sd[f"{p}.weight_v"]
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm


def wn_linear(sd: SD, p: str) -> dict:
    out = {"kernel": _t(fold_weight_norm(sd, p))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def wn_conv1d_as_dense(sd: SD, p: str) -> dict:
    w = fold_weight_norm(sd, p)  # (O, I, 1)
    out = {"kernel": _t(w[:, :, 0])}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def wn_conv1d(sd: SD, p: str) -> dict:
    w = fold_weight_norm(sd, p)  # (O, I, K)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def groupnorm(sd: SD, p: str) -> dict:
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


# ---------------------------------------------------------------------------
# s2mel (DiT + CFM + length regulator + gpt_layer), reference s2mel.pth
# state["net"] layout (commons.py:579-635)
# ---------------------------------------------------------------------------


def convert_dit(sd: SD, prefix: str, depth: int, wn_layers: int) -> dict:
    """reference CFM estimator (prefix typically 'estimator')."""
    e = prefix
    p = {
        "t_embedder": {
            "mlp_0": linear(sd, f"{e}.t_embedder.mlp.0"),
            "mlp_2": linear(sd, f"{e}.t_embedder.mlp.2"),
        },
        "t_embedder2": {
            "mlp_0": linear(sd, f"{e}.t_embedder2.mlp.0"),
            "mlp_2": linear(sd, f"{e}.t_embedder2.mlp.2"),
        },
        "cond_projection": linear(sd, f"{e}.cond_projection"),
        "cond_x_merge_linear": linear(sd, f"{e}.cond_x_merge_linear"),
        "skip_linear": linear(sd, f"{e}.skip_linear"),
        "conv1": linear(sd, f"{e}.conv1"),
        "conv2": conv1d_as_dense(sd, f"{e}.conv2"),
        "res_projection": linear(sd, f"{e}.res_projection"),
        "final_layer": {
            "linear": wn_linear(sd, f"{e}.final_layer.linear"),
            "adaLN_1": linear(sd, f"{e}.final_layer.adaLN_modulation.1"),
        },
    }
    tr = {}
    n = depth
    recv = [i for i in range(n) if i > n // 2]
    for i in range(n):
        b = f"{e}.transformer.layers.{i}"
        layer = {
            "attention": {
                "wqkv": linear(sd, f"{b}.attention.wqkv"),
                "wo": linear(sd, f"{b}.attention.wo"),
            },
            "feed_forward": {
                "w1": linear(sd, f"{b}.feed_forward.w1"),
                "w2": linear(sd, f"{b}.feed_forward.w2"),
                "w3": linear(sd, f"{b}.feed_forward.w3"),
            },
            "attention_norm": {
                "rms_weight": sd[f"{b}.attention_norm.norm.weight"],
                "project_layer": linear(sd, f"{b}.attention_norm.project_layer"),
            },
            "ffn_norm": {
                "rms_weight": sd[f"{b}.ffn_norm.norm.weight"],
                "project_layer": linear(sd, f"{b}.ffn_norm.project_layer"),
            },
        }
        if i in recv:
            layer["skip_in_linear"] = linear(sd, f"{b}.skip_in_linear")
        tr[f"layer_{i}"] = layer
    tr["norm"] = {
        "rms_weight": sd[f"{e}.transformer.norm.norm.weight"],
        "project_layer": linear(sd, f"{e}.transformer.norm.project_layer"),
    }
    p["transformer"] = tr

    wn = {"cond_layer": wn_conv1d_as_dense(sd, f"{e}.wavenet.cond_layer.conv.conv")}
    for i in range(wn_layers):
        wn[f"in_layer_{i}"] = wn_conv1d(sd, f"{e}.wavenet.in_layers.{i}.conv.conv")
        wn[f"res_skip_{i}"] = wn_conv1d_as_dense(
            sd, f"{e}.wavenet.res_skip_layers.{i}.conv.conv"
        )
    p["wavenet"] = wn
    return p


def convert_length_regulator(sd: SD, n_ratios: int = 4) -> dict:
    p = {"content_in_proj": linear(sd, "content_in_proj")}
    for i in range(n_ratios):
        p[f"conv_{i}"] = conv1d(sd, f"model.{3 * i}")
        p[f"norm_{i}"] = groupnorm(sd, f"model.{3 * i + 1}")
    p["out_proj"] = conv1d_as_dense(sd, f"model.{3 * n_ratios}")
    return p


def convert_gpt_layer(sd: SD) -> dict:
    return {
        "linear_0": linear(sd, "0"),
        "linear_1": linear(sd, "1"),
        "linear_2": linear(sd, "2"),
    }


def convert_s2mel(
    net: Dict[str, SD],
    depth: int = 13,
    wn_layers: int = 8,
    n_ratios: int = 4,
    cfm_only: bool = False,
) -> dict:
    """net: {'cfm': sd, 'length_regulator': sd, 'gpt_layer': sd} (each with
    DDP 'module.' prefixes already stripped). cfm_only: convert just the
    estimator (e.g. for CFM training, where the regulator/gpt_layer state
    may not exist yet)."""
    out = {"cfm_estimator": convert_dit(net["cfm"], "estimator", depth, wn_layers)}
    if not cfm_only:
        out["length_regulator"] = convert_length_regulator(
            net["length_regulator"], n_ratios
        )
        out["gpt_layer"] = convert_gpt_layer(net["gpt_layer"])
    return out


# ---------------------------------------------------------------------------
# BigVGAN v2 vocoder
# ---------------------------------------------------------------------------


def _maybe_fold(sd: SD, p: str) -> Array:
    """Return conv weight, folding legacy weight-norm if present."""
    if f"{p}.weight_g" in sd:
        return fold_weight_norm(sd, p)
    return sd[f"{p}.weight"]


def _bv_conv1d(sd: SD, p: str) -> dict:
    w = _maybe_fold(sd, p)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _bv_convtranspose1d(sd: SD, p: str) -> dict:
    w = _maybe_fold(sd, p)  # (I, O, K)
    # flax ConvTranspose wants (K, I, O) with the K axis flipped
    out = {"kernel": np.ascontiguousarray(w[:, :, ::-1].transpose(2, 0, 1))}
    if f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def convert_bigvgan(sd: SD, cfg) -> dict:
    """Reference BigVGAN state dict (weight-norm or folded) -> flax params.
    cfg: BigVGANConfig."""
    p = {
        "conv_pre": _bv_conv1d(sd, "conv_pre"),
        "conv_post": _bv_conv1d(sd, "conv_post"),
        "alpha_post": sd["activation_post.act.alpha"],
        "beta_post": sd["activation_post.act.beta"],
    }
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        p[f"up_{i}"] = _bv_convtranspose1d(sd, f"ups.{i}.0")
        for j in range(nk):
            r = f"resblocks.{i * nk + j}"
            blk = {}
            n = len(cfg.resblock_dilation_sizes[j])
            for m in range(n):
                blk[f"conv1_{m}"] = _bv_conv1d(sd, f"{r}.convs1.{m}")
                blk[f"conv2_{m}"] = _bv_conv1d(sd, f"{r}.convs2.{m}")
                # activations list order: [a1_0, a2_0, a1_1, a2_1, ...]
                blk[f"alpha1_{m}"] = sd[f"{r}.activations.{2 * m}.act.alpha"]
                blk[f"beta1_{m}"] = sd[f"{r}.activations.{2 * m}.act.beta"]
                blk[f"alpha2_{m}"] = sd[f"{r}.activations.{2 * m + 1}.act.alpha"]
                blk[f"beta2_{m}"] = sd[f"{r}.activations.{2 * m + 1}.act.beta"]
            p[f"resblock_{i}_{j}"] = blk
    return p


# ---------------------------------------------------------------------------
# RepCodec semantic codec (HF safetensors layout, kmeans/repcodec_model.py)
# ---------------------------------------------------------------------------


def _convnext_backbone(sd: SD, prefix: str, num_layers: int) -> dict:
    p = {
        "embed": conv1d(sd, f"{prefix}.embed"),
        "norm": layernorm(sd, f"{prefix}.norm"),
        "final_layer_norm": layernorm(sd, f"{prefix}.final_layer_norm"),
    }
    for i in range(num_layers):
        b = f"{prefix}.convnext.{i}"
        p[f"convnext_{i}"] = {
            "dwconv": conv1d(sd, f"{b}.dwconv"),
            "norm": layernorm(sd, f"{b}.norm"),
            "pwconv1": linear(sd, f"{b}.pwconv1"),
            "pwconv2": linear(sd, f"{b}.pwconv2"),
            "gamma": sd[f"{b}.gamma"],
        }
    return p


def convert_repcodec(sd: SD, cfg) -> dict:
    """cfg: SemanticCodecConfig. Only the inference path (encoder+quantizer)."""
    q = "quantizer.quantizers.0"
    return {
        "encoder_backbone": _convnext_backbone(sd, "encoder.0", cfg.vocos_num_layers),
        "encoder_out": linear(sd, "encoder.1"),
        "quantizer": {
            "in_project": wn_conv1d_as_dense(sd, f"{q}.in_project"),
            "out_project": wn_conv1d_as_dense(sd, f"{q}.out_project"),
            "codebook": sd[f"{q}.codebook.weight"],
        },
    }


# ---------------------------------------------------------------------------
# CAMPPlus speaker encoder (campplus/DTDNN.py)
# ---------------------------------------------------------------------------


def batchnorm(sd: SD, p: str, affine: bool = True) -> dict:
    out = {"mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]}
    if affine:
        out["scale"] = sd[f"{p}.weight"]
        out["bias"] = sd[f"{p}.bias"]
    return out


def _basic_resblock(sd: SD, p: str, has_shortcut: bool) -> dict:
    out = {
        "conv1": conv2d(sd, f"{p}.conv1"),
        "bn1": batchnorm(sd, f"{p}.bn1"),
        "conv2": conv2d(sd, f"{p}.conv2"),
        "bn2": batchnorm(sd, f"{p}.bn2"),
    }
    if has_shortcut:
        out["shortcut_conv"] = conv2d(sd, f"{p}.shortcut.0")
        out["shortcut_bn"] = batchnorm(sd, f"{p}.shortcut.1")
    return out


def convert_campplus(sd: SD, cfg) -> dict:
    """cfg: CampPlusConfig."""
    p = {
        "head": {
            "conv1": conv2d(sd, "head.conv1"),
            "bn1": batchnorm(sd, "head.bn1"),
            "layer1_0": _basic_resblock(sd, "head.layer1.0", True),
            "layer1_1": _basic_resblock(sd, "head.layer1.1", False),
            "layer2_0": _basic_resblock(sd, "head.layer2.0", True),
            "layer2_1": _basic_resblock(sd, "head.layer2.1", False),
            "conv2": conv2d(sd, "head.conv2"),
            "bn2": batchnorm(sd, "head.bn2"),
        },
        "tdnn_conv": conv1d(sd, "xvector.tdnn.linear"),
        "tdnn_bn": batchnorm(sd, "xvector.tdnn.nonlinear.batchnorm"),
        "out_bn": batchnorm(sd, "xvector.out_nonlinear.batchnorm"),
        "dense_linear": conv1d_as_dense(sd, "xvector.dense.linear"),
        "dense_bn": batchnorm(sd, "xvector.dense.nonlinear.batchnorm", affine=False),
    }
    for bi, num_layers in enumerate((12, 24, 16)):
        for li in range(num_layers):
            b = f"xvector.block{bi + 1}.tdnnd{li + 1}"
            p[f"block{bi + 1}_tdnnd{li + 1}"] = {
                "nonlinear1_bn": batchnorm(sd, f"{b}.nonlinear1.batchnorm"),
                "linear1": conv1d_as_dense(sd, f"{b}.linear1"),
                "nonlinear2_bn": batchnorm(sd, f"{b}.nonlinear2.batchnorm"),
                "cam_layer": {
                    "linear_local": conv1d(sd, f"{b}.cam_layer.linear_local"),
                    "linear1": conv1d_as_dense(sd, f"{b}.cam_layer.linear1"),
                    "linear2": conv1d_as_dense(sd, f"{b}.cam_layer.linear2"),
                },
            }
        p[f"transit{bi + 1}_bn"] = batchnorm(
            sd, f"xvector.transit{bi + 1}.nonlinear.batchnorm"
        )
        p[f"transit{bi + 1}_linear"] = conv1d_as_dense(
            sd, f"xvector.transit{bi + 1}.linear"
        )
    return p


# ---------------------------------------------------------------------------
# w2v-BERT 2.0 (HF Wav2Vec2BertModel state dict)
# ---------------------------------------------------------------------------


def convert_w2vbert(sd: SD, cfg) -> dict:
    """cfg: W2VBertConfig. Only feature_projection + first tap_layer layers."""
    p = {
        "fp_layer_norm": layernorm(sd, "feature_projection.layer_norm"),
        "fp_projection": linear(sd, "feature_projection.projection"),
    }
    for i in range(cfg.tap_layer):
        b = f"encoder.layers.{i}"
        layer = {
            "ffn1_layer_norm": layernorm(sd, f"{b}.ffn1_layer_norm"),
            "ffn1": {
                "intermediate_dense": linear(sd, f"{b}.ffn1.intermediate_dense"),
                "output_dense": linear(sd, f"{b}.ffn1.output_dense"),
            },
            "self_attn_layer_norm": layernorm(sd, f"{b}.self_attn_layer_norm"),
            "self_attn": {
                "linear_q": linear(sd, f"{b}.self_attn.linear_q"),
                "linear_k": linear(sd, f"{b}.self_attn.linear_k"),
                "linear_v": linear(sd, f"{b}.self_attn.linear_v"),
                "linear_out": linear(sd, f"{b}.self_attn.linear_out"),
            },
            "conv_module": {
                "layer_norm": layernorm(sd, f"{b}.conv_module.layer_norm"),
                "pointwise_conv1": conv1d_as_dense(sd, f"{b}.conv_module.pointwise_conv1"),
                "depthwise_conv": depthwise_conv1d(sd, f"{b}.conv_module.depthwise_conv"),
                "depthwise_layer_norm": layernorm(sd, f"{b}.conv_module.depthwise_layer_norm"),
                "pointwise_conv2": conv1d_as_dense(sd, f"{b}.conv_module.pointwise_conv2"),
            },
            "ffn2_layer_norm": layernorm(sd, f"{b}.ffn2_layer_norm"),
            "ffn2": {
                "intermediate_dense": linear(sd, f"{b}.ffn2.intermediate_dense"),
                "output_dense": linear(sd, f"{b}.ffn2.output_dense"),
            },
            "final_layer_norm": layernorm(sd, f"{b}.final_layer_norm"),
        }
        if cfg.position_embeddings_type == "relative_key":
            layer["self_attn"]["distance_embedding"] = sd[
                f"{b}.self_attn.distance_embedding.weight"
            ]
        p[f"layer_{i}"] = layer
    return p


# ---------------------------------------------------------------------------
# Qwen3 causal LM (HF Qwen3ForCausalLM state dict)
# ---------------------------------------------------------------------------


def convert_qwen3(sd: SD, cfg) -> dict:
    """cfg: QwenEmoConfig. Tied embeddings (no separate lm_head needed)."""
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    p = {
        "embed_tokens": {"embedding": sd[f"{pre}embed_tokens.weight"]},
        "norm": {"weight": sd[f"{pre}norm.weight"]},
    }
    for i in range(cfg.num_hidden_layers):
        b = f"{pre}layers.{i}"
        p[f"layer_{i}"] = {
            "input_layernorm": {"weight": sd[f"{b}.input_layernorm.weight"]},
            "post_attention_layernorm": {
                "weight": sd[f"{b}.post_attention_layernorm.weight"]
            },
            "self_attn": {
                "q_proj": linear(sd, f"{b}.self_attn.q_proj"),
                "k_proj": linear(sd, f"{b}.self_attn.k_proj"),
                "v_proj": linear(sd, f"{b}.self_attn.v_proj"),
                "o_proj": linear(sd, f"{b}.self_attn.o_proj"),
                "q_norm": {"weight": sd[f"{b}.self_attn.q_norm.weight"]},
                "k_norm": {"weight": sd[f"{b}.self_attn.k_norm.weight"]},
            },
            "mlp": {
                "gate_proj": linear(sd, f"{b}.mlp.gate_proj"),
                "up_proj": linear(sd, f"{b}.mlp.up_proj"),
                "down_proj": linear(sd, f"{b}.mlp.down_proj"),
            },
        }
    return p


# ---------------------------------------------------------------------------
# v1 family: UnifiedVoice v1, ECAPA-TDNN, BigVGAN v1, DVAE
# ---------------------------------------------------------------------------


def convert_unified_voice_v1(sd: SD, cfg: GPTConfig) -> dict:
    """gpt/model.py UnifiedVoice (v1) state dict -> flax params."""
    return {
        "conditioning_encoder": convert_conformer(
            sd, "conditioning_encoder", cfg.condition_module.num_blocks
        ),
        "perceiver_encoder": convert_perceiver(sd, "perceiver_encoder"),
        "text_embedding": embedding(sd, "text_embedding"),
        "mel_embedding": embedding(sd, "mel_embedding"),
        "mel_pos_embedding": {"embedding": sd["mel_pos_embedding.emb.weight"]},
        "text_pos_embedding": {"embedding": sd["text_pos_embedding.emb.weight"]},
        "final_norm": layernorm(sd, "final_norm"),
        "mel_head": linear(sd, "mel_head"),
        "text_head": linear(sd, "text_head"),
        "gpt": convert_gpt2_core(sd, "gpt", cfg.layers),
    }


def _sb_conv(sd: SD, p: str) -> dict:
    """speechbrain Conv1d wrapper: inner nn.Conv1d at .conv."""
    return conv1d(sd, f"{p}.conv")


def _sb_conv_dense(sd: SD, p: str) -> dict:
    return conv1d_as_dense(sd, f"{p}.conv")


def _sb_bn(sd: SD, p: str) -> dict:
    return batchnorm(sd, f"{p}.norm")


def _tdnn_block(sd: SD, p: str) -> dict:
    return {"conv": _sb_conv(sd, f"{p}.conv"), "norm": _sb_bn(sd, f"{p}.norm")}


def convert_ecapa(sd: SD, prefix: str = "", n_se_blocks: int = 3, scale: int = 8) -> dict:
    """prefix: e.g. 'speaker_encoder.' (include the trailing dot) or ''."""
    p = {"block_0": _tdnn_block(sd, f"{prefix}blocks.0")}
    for i in range(1, n_se_blocks + 1):
        b = f"{prefix}blocks.{i}"
        blk = {
            "tdnn1": _tdnn_block(sd, f"{b}.tdnn1"),
            "tdnn2": _tdnn_block(sd, f"{b}.tdnn2"),
            "se_block": {
                "conv1": _sb_conv_dense(sd, f"{b}.se_block.conv1"),
                "conv2": _sb_conv_dense(sd, f"{b}.se_block.conv2"),
            },
        }
        r2 = {}
        for j in range(scale - 1):
            r2[f"block_{j}"] = _tdnn_block(sd, f"{b}.res2net_block.blocks.{j}")
        blk["res2net_block"] = r2
        if f"{b}.shortcut.conv.weight" in sd:
            blk["shortcut"] = _sb_conv_dense(sd, f"{b}.shortcut")
        p[f"block_{i}"] = blk
    p["mfa"] = _tdnn_block(sd, f"{prefix}mfa")
    p["asp"] = {
        "tdnn": _tdnn_block(sd, f"{prefix}asp.tdnn"),
        "conv": _sb_conv_dense(sd, f"{prefix}asp.conv"),
    }
    p["asp_bn"] = _sb_bn(sd, f"{prefix}asp_bn")
    p["fc"] = _sb_conv_dense(sd, f"{prefix}fc")
    return p


def convert_bigvgan_v1(sd: SD, cfg) -> dict:
    """cfg: BigVGANv1Config; sd: indextts/BigVGAN/models.py state dict."""
    p = {
        "conv_pre": _bv_conv1d(sd, "conv_pre"),
        "conv_post": _bv_conv1d(sd, "conv_post"),
        "alpha_post": sd["activation_post.act.alpha"],
        "beta_post": sd["activation_post.act.beta"],
        "speaker_encoder": convert_ecapa(sd, "speaker_encoder."),
        "cond_layer": conv1d_as_dense(sd, "cond_layer"),
    }
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        p[f"up_{i}"] = _bv_convtranspose1d(sd, f"ups.{i}.0")
        if cfg.cond_d_vector_in_each_upsampling_layer:
            p[f"cond_{i}"] = conv1d_as_dense(sd, f"conds.{i}")
        for j in range(nk):
            r = f"resblocks.{i * nk + j}"
            blk = {}
            n = len(cfg.resblock_dilation_sizes[j])
            for m in range(n):
                blk[f"conv1_{m}"] = _bv_conv1d(sd, f"{r}.convs1.{m}")
                blk[f"conv2_{m}"] = _bv_conv1d(sd, f"{r}.convs2.{m}")
                blk[f"alpha1_{m}"] = sd[f"{r}.activations.{2 * m}.act.alpha"]
                blk[f"beta1_{m}"] = sd[f"{r}.activations.{2 * m}.act.beta"]
                blk[f"alpha2_{m}"] = sd[f"{r}.activations.{2 * m + 1}.act.alpha"]
                blk[f"beta2_{m}"] = sd[f"{r}.activations.{2 * m + 1}.act.beta"]
            p[f"resblock_{i}_{j}"] = blk
    return p


def convert_dvae(sd: SD, cfg) -> dict:
    """cfg: DVAEConfig; encoder-side only (tokenizer use)."""
    p = {"codebook": sd["codebook.embed"]}
    idx = 0
    for i in range(cfg.num_layers):
        p[f"enc_conv_{i}"] = conv1d(sd, f"encoder.{idx}.0")
        idx += 1
    for r in range(cfg.num_resnet_blocks):
        p[f"enc_res_{r}"] = {
            "conv_0": conv1d(sd, f"encoder.{idx}.net.0"),
            "conv_1": conv1d(sd, f"encoder.{idx}.net.2"),
            "conv_2": conv1d(sd, f"encoder.{idx}.net.4"),
        }
        idx += 1
    p["enc_out"] = conv1d(sd, f"encoder.{idx}")
    return p


def quantize_gpt_tree(p_gpt: dict, head: bool = False, bits: int = 8) -> dict:
    """Quantize a converted UnifiedVoice param tree's GPT-2 block matmuls to
    W8A8 (models/gpt2.py Conv1D quantize=True layout) or, with bits=4, to the
    packed-nibble W4A8 layout (Conv1D wbits=4; the MLP c_proj packs along its
    output columns for the fused mlp_w4 kernel). Embeddings and norms stay
    float; `head=True` additionally converts mel_head to the lane-padded
    int8 layout (gpt2.QuantDenseHead — the decode-step logits GEMV)."""
    from indextts_tpu.models.gpt2 import (
        quantize_conv1d_params,
        quantize_conv1d_params_w4,
        quantize_dense_head_params,
    )

    assert bits in (8, 4), bits
    if bits == 4:
        def qrows(t):
            return quantize_conv1d_params_w4(t)

        def qmlp_proj(t):
            return quantize_conv1d_params_w4(t, cols=True)
    else:
        qrows = qmlp_proj = quantize_conv1d_params

    out = dict(p_gpt)
    if head:
        out["mel_head"] = quantize_dense_head_params(out["mel_head"])
    gpt = dict(out["gpt"])
    for name, layer in gpt.items():
        if not name.startswith("h_"):
            continue
        layer = dict(layer)
        attn = dict(layer["attn"])
        attn["c_attn"] = qrows(attn["c_attn"])
        attn["c_proj"] = qrows(attn["c_proj"])
        layer["attn"] = attn
        mlp = dict(layer["mlp"])
        mlp["c_fc"] = qrows(mlp["c_fc"])
        mlp["c_proj"] = qmlp_proj(mlp["c_proj"])
        layer["mlp"] = mlp
        gpt[name] = layer
    out["gpt"] = gpt
    return out


def strip_ddp_prefix(sd: SD) -> SD:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v for k, v in sd.items()
    }
