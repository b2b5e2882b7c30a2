"""Checkpoint loading: reference torch checkpoint dir -> engine, plus native
Orbax save/restore of the converted trees.

Reference checkpoint layout (config.yaml + infer_v2.py:138-289):
  gpt.pth                    strict torch state dict (UnifiedVoice)
  s2mel.pth                  state["net"] multi-module dict
  wav2vec2bert_stats.pt      {"mean","std"} tensors
  feat1.pt / feat2.pt        spk/emo matrices
  bpe.model                  SentencePiece BPE
  hf/ (optional)             local copies of w2v-bert-2.0, bigvgan,
                             campplus_cn_common.bin, semantic codec safetensors
Converted params are cached to <model_dir>/jax_cache via Orbax so subsequent
loads skip torch entirely.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple


from indextts_tpu.config import IndexTTS2Config, load_config


def _orbax_save(path: Path, tree: Dict[str, Any]):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.resolve(), tree, force=True)
    ckptr.wait_until_finished()


def _orbax_restore(path: Path) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path.resolve())


def convert_reference_checkpoints(
    model_dir: str, cfg: IndexTTS2Config
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch checkpoint dir -> (params dict, aux dict). Needs torch installed."""
    import torch

    from indextts_tpu.runtime import torch_convert as tc

    d = Path(model_dir)
    params: Dict[str, Any] = {}
    aux: Dict[str, Any] = {}

    gpt_path = d / "gpt.pth"
    if gpt_path.exists():
        sd = torch.load(gpt_path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        params["gpt"] = tc.convert_unified_voice(tc.to_numpy_sd(sd), cfg.gpt)

    s2mel_path = d / "s2mel.pth"
    if s2mel_path.exists():
        state = torch.load(s2mel_path, map_location="cpu", weights_only=False)
        net = state.get("net", state)
        net_np = {
            k: tc.strip_ddp_prefix(tc.to_numpy_sd(v)) for k, v in net.items()
        }
        # layer counts come from the config tree, not the full-size defaults:
        # a config.yaml shipped next to the weights (tiny or resized models)
        # must convert consistently with the engine it feeds
        params["s2mel"] = tc.convert_s2mel(
            net_np,
            depth=cfg.s2mel.dit.depth,
            wn_layers=cfg.s2mel.wavenet.num_layers,
            n_ratios=len(cfg.s2mel.length_regulator.sampling_ratios),
        )

    stats_path = d / "wav2vec2bert_stats.pt"
    if stats_path.exists():
        st = torch.load(stats_path, map_location="cpu", weights_only=False)
        aux["semantic_stats"] = (
            st["mean"].float().numpy(),
            st["std"].float().numpy(),
        )

    for name, key in (("feat2.pt", "emo_matrix"), ("feat1.pt", "spk_matrix")):
        p = d / name
        if p.exists():
            aux[key] = torch.load(p, map_location="cpu", weights_only=False).float().numpy()

    # HF-format components (local dirs/files)
    hf = d / "hf"
    w2v_dir = hf / "w2v-bert-2.0"
    if w2v_dir.exists():
        from safetensors.numpy import load_file

        sd = {}
        for f in sorted(w2v_dir.glob("*.safetensors")):
            sd.update(load_file(str(f)))
        params["w2vbert"] = tc.convert_w2vbert(sd, cfg.w2vbert)

    codec_path = hf / "semantic_codec.safetensors"
    if codec_path.exists():
        from safetensors.numpy import load_file

        params["repcodec"] = tc.convert_repcodec(load_file(str(codec_path)), cfg.semantic_codec)

    camp_path = hf / "campplus_cn_common.bin"
    if camp_path.exists():
        sd = torch.load(camp_path, map_location="cpu", weights_only=False)
        params["campplus"] = tc.convert_campplus(tc.to_numpy_sd(sd), cfg.campplus)

    bigvgan_path = hf / "bigvgan_generator.pt"
    if bigvgan_path.exists():
        sd = torch.load(bigvgan_path, map_location="cpu", weights_only=False)
        sd = sd.get("generator", sd)
        params["bigvgan"] = tc.convert_bigvgan(tc.to_numpy_sd(sd), cfg.vocoder)

    return params, aux


def load_engine(
    model_dir: str,
    cfg_path: Optional[str] = None,
    use_native_cache: bool = True,
    cfg: Optional[IndexTTS2Config] = None,
    **engine_kwargs,
):
    """Build an IndexTTS2Engine from a checkpoint directory.

    cfg: an already-built config tree overrides cfg_path/config.yaml —
    needed when the architecture differs from the reference defaults in
    sections config.yaml does not express (vocoder/w2vbert/campplus come
    from their own HF checkpoints in the reference, infer_v2.py:187-264)."""
    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params

    d = Path(model_dir)
    if cfg is None:
        cfg = load_config(cfg_path or (str(d / "config.yaml") if (d / "config.yaml").exists() else None))

    cache = d / "jax_cache"
    params: Optional[Dict[str, Any]] = None
    aux: Dict[str, Any] = {}
    if use_native_cache and (cache / "params").exists():
        params = _orbax_restore(cache / "params")
        if (cache / "aux").exists():
            aux = _orbax_restore(cache / "aux")
    else:
        params, aux = convert_reference_checkpoints(model_dir, cfg)
        if use_native_cache and params:
            try:
                _orbax_save(cache / "params", params)
                if aux:
                    _orbax_save(cache / "aux", aux)
            except Exception:
                pass

    # fill any missing component with random weights (partial checkpoints)
    full = random_params(cfg, seed=0)
    for k, v in full.items():
        params.setdefault(k, v)

    tokenizer = None
    bpe = d / "bpe.model"
    if bpe.exists():
        from indextts_tpu.frontend.normalize import TextNormalizer
        from indextts_tpu.frontend.tokenizer import TextTokenizer

        tokenizer = TextTokenizer(str(bpe), TextNormalizer())

    return IndexTTS2Engine(
        cfg,
        params,
        emo_matrix=aux.get("emo_matrix"),
        spk_matrix=aux.get("spk_matrix"),
        semantic_stats=aux.get("semantic_stats"),
        tokenizer=tokenizer,
        **engine_kwargs,
    )
