"""W8A8 int8 GPT quantization: output fidelity + decode functionality
(the reference's INT8 capability, vram_utils.py:13-52, TPU-native)."""

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.models.unified_voice import UnifiedVoice
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
from indextts_tpu.runtime.torch_convert import quantize_gpt_tree

TINY = GPTConfig(
    model_dim=64, layers=2, heads=4, max_mel_tokens=64, max_text_tokens=32,
    number_text_tokens=50, number_mel_codes=36, start_mel_token=34,
    stop_mel_token=35,
    condition_module=ConditionModuleConfig(
        output_size=32, linear_units=48, attention_heads=4, num_blocks=1
    ),
    emo_condition_module=ConditionModuleConfig(
        output_size=32, linear_units=32, attention_heads=2, num_blocks=1
    ),
)


def _init_params(model):
    B, Lt, Lm = 1, 6, 8
    p = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, 32, 64)), jnp.zeros((B, Lt), jnp.int32), jnp.asarray([Lt]),
        jnp.zeros((B, Lm), jnp.int32), jnp.asarray([Lm]), jnp.zeros((B, 64)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k, v in ph.items():
        p.setdefault(k, v)
    return p


def test_int8_latents_close(rng):
    fp = UnifiedVoice(TINY)
    params = _init_params(fp)
    qmodel = UnifiedVoice(TINY, quantize_gpt=True)
    qparams = quantize_gpt_tree(params)

    args = (
        jnp.asarray(rng.standard_normal((1, 32, 64)), jnp.float32),
        jnp.asarray(rng.integers(2, 50, (1, 6)), jnp.int32), jnp.asarray([6]),
        jnp.asarray(rng.integers(0, 34, (1, 8)), jnp.int32), jnp.asarray([8]),
        jnp.asarray(rng.standard_normal((1, 64)), jnp.float32),
    )
    want = np.asarray(fp.apply({"params": params}, *args, method=UnifiedVoice.forward_latent))
    got = np.asarray(qmodel.apply({"params": qparams}, *args, method=UnifiedVoice.forward_latent))
    cos = np.sum(want * got) / (np.linalg.norm(want) * np.linalg.norm(got) + 1e-9)
    assert cos > 0.995, cos


def test_int8_decode_runs(rng):
    qmodel = UnifiedVoice(TINY, quantize_gpt=True)
    params = quantize_gpt_tree(_init_params(UnifiedVoice(TINY)))
    dec = GPTDecoder(qmodel, TINY, SamplingConfig())
    text = rng.integers(2, 50, (1, 5))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([5]), 5)
    conds = jnp.zeros((1, 34, 64))
    res = dec.generate(
        {"params": params}, conds, jnp.asarray(ids), jnp.asarray(pos),
        jnp.asarray(valid), jax.random.PRNGKey(0), max_new=10,
    )
    codes = np.asarray(res.codes)
    assert codes.shape == (1, 10)
    assert ((codes >= 0) & (codes < 36)).all()


def test_engine_gpt_quantize_smoke():
    """RuntimeConfig.gpt_quantize: engine converts the GPT tree through
    quantize_gpt_tree and the full cascade (beam default + sampling +
    kv_quant combo) still produces finite audio."""
    import dataclasses as dc
    import sys
    from pathlib import Path

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).parent))
    from test_engine_e2e import tiny_config

    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params

    cfg = tiny_config()
    cfg = dc.replace(
        cfg,
        runtime=dc.replace(
            cfg.runtime, gpt_quantize=True, kv_quant=True, num_beams=1,
            max_mel_tokens=24,
        ),
    )
    engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    wav = (np.random.default_rng(3).standard_normal(16000) * 0.1).astype(
        np.float32
    )
    out = engine.infer((wav, 16000), [np.random.default_rng(4).integers(2, 50, 7)], seed=0)
    assert np.isfinite(out["audio"]).all() and out["audio"].size > 0


def test_head_quant_logits_close(rng):
    """QuantDenseHead (int8 lane-padded mel_head) vs the float Dense head:
    logits agree within W8A8 quantization tolerance and the padded columns
    never leak into the sliced output."""
    fp = UnifiedVoice(TINY)
    params = _init_params(fp)
    qmodel = UnifiedVoice(TINY, quantize_gpt=True, head_quant=True)
    qparams = quantize_gpt_tree(params, head=True)
    assert qparams["mel_head"]["kernel_q"].shape == (64, 128)  # 36 -> 128 pad

    h = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    want = np.asarray(
        fp.apply({"params": params}, h,
                 method=UnifiedVoice.mel_logits_from_hidden)
    )
    got = np.asarray(
        qmodel.apply({"params": qparams}, h,
                     method=UnifiedVoice.mel_logits_from_hidden)
    )
    assert got.shape == want.shape == (3, 36)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05, rel


def test_quant_dense_head_gemv_matches_xla(rng):
    """QuantDenseHead's streaming-GEMV route (interpret mode) matches its own
    XLA W8A8 contraction bit-closely at a gemv-supported dim."""
    from indextts_tpu.models.gpt2 import (
        QuantDenseHead,
        quantize_dense_head_params,
    )

    d, f = 256, 1000  # fpad = 1024
    tree = quantize_dense_head_params({
        "kernel": rng.standard_normal((d, f)).astype(np.float32) * 0.02,
        "bias": rng.standard_normal(f).astype(np.float32) * 0.01,
    })
    x = jnp.asarray(rng.standard_normal((1, d)), jnp.float32)
    xla = QuantDenseHead(f, gemv=False)
    gemv = QuantDenseHead(f, gemv=True, pallas_interpret=True)
    want = np.asarray(xla.apply({"params": tree}, x))
    got = np.asarray(gemv.apply({"params": tree}, x))
    assert got.shape == want.shape == (1, f)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_head_quant_decode_runs(rng):
    """Full tiny decode with head_quant: codes stay in vocab (the padded
    logit columns must never be sampled)."""
    params = quantize_gpt_tree(
        _init_params(UnifiedVoice(TINY)), head=True
    )
    model = UnifiedVoice(TINY, quantize_gpt=True, head_quant=True)
    dec = GPTDecoder(model, TINY, SamplingConfig())
    text = rng.integers(2, 50, (1, 5))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([5]), 5)
    conds = jnp.zeros((1, 34, 64))
    res = dec.generate(
        {"params": params}, conds, jnp.asarray(ids), jnp.asarray(pos),
        jnp.asarray(valid), jax.random.PRNGKey(0), max_new=10,
    )
    codes = np.asarray(res.codes)
    assert codes.shape == (1, 10)
    assert ((codes >= 0) & (codes < 36)).all()


def test_head_quant_beam_routes():
    """Engine default beam-multinomial route (num_beams=3) and the
    deterministic beam both run under gpt_quantize+head_quant (the beam's
    (B*nb, D) head calls take QuantDenseHead's XLA fallback)."""
    import dataclasses as dc
    import sys
    from pathlib import Path

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).parent))
    from test_engine_e2e import tiny_config

    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params

    cfg = tiny_config()
    cfg = dc.replace(cfg, runtime=dc.replace(
        cfg.runtime, gpt_quantize=True, head_quant=True, num_beams=3,
        max_mel_tokens=16))
    e = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    wav = (np.random.default_rng(3).standard_normal(16000) * 0.1).astype(np.float32)
    text = [np.random.default_rng(4).integers(2, 50, 7)]
    for do_sample in (True, False):
        out = e.infer((wav, 16000), text, seed=0, num_beams=3,
                      do_sample=do_sample)
        assert np.isfinite(out["audio"]).all() and out["audio"].size > 0
