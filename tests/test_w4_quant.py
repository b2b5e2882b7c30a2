"""W4A8 packed-nibble GPT quantization (Conv1D wbits=4 + ops/gemv.py
gemv_w4 / mlp_w4 kernels).

Covers: pack/unpack roundtrip, kernel-vs-XLA contraction parity (interpret
mode on CPU), GPT2Core decode-step equivalence between the Pallas route and
the XLA unpack fallback, prefill invariance, quantize_gpt_tree(bits=4)
fidelity vs the float model, and an end-to-end W4 decode. The TPU win is
benchmarked separately (tools/bench_decode_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.models.gpt2 import (
    GPT2Core,
    _quant_row,
    init_kv_cache,
    pack_w4,
    quantize_conv1d_params_w4,
)
from indextts_tpu.ops import gemv as gemv_ops

D, FH = 256, 1024


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_supports_w4_gating():
    assert gemv_ops.supports_w4(1280, 3840)  # c_attn flagship
    assert gemv_ops.supports_w4(1280, 1280)  # attn c_proj
    assert gemv_ops.supports_mlp_w4(1280, 5120)  # MLP flagship
    assert not gemv_ops.supports_w4(96, 256)  # d % 64 != 0 -> fallback
    assert not gemv_ops.supports_w4(256, 100)  # unblockable out dim


def test_pack_unpack_roundtrip(rng):
    q = rng.integers(-8, 8, (64, 96)).astype(np.int32)
    got_r = np.asarray(gemv_ops.unpack_w4(jnp.asarray(pack_w4(q)), axis=0))
    np.testing.assert_array_equal(got_r, q)
    got_c = np.asarray(
        gemv_ops.unpack_w4(jnp.asarray(pack_w4(q, cols=True)), axis=1)
    )
    np.testing.assert_array_equal(got_c, q)


def _w4_weights(rng, d, f, cols=False):
    w = rng.standard_normal((d, f)).astype(np.float32) * 0.02
    t = quantize_conv1d_params_w4(
        {"kernel": w,
         "bias": rng.standard_normal(f).astype(np.float32) * 0.01},
        cols=cols,
    )
    return w, t["kernel_q4"], t["kernel_scale"], t["bias"]


def test_gemv_w4_matches_xla_contraction(rng):
    w, w_p, w_s, b = _w4_weights(rng, D, 768)
    x = jnp.asarray(rng.standard_normal((1, D)), jnp.float32) * 0.5
    x_q, a = _quant_row(x)
    w_q = gemv_ops.unpack_w4(jnp.asarray(w_p), axis=0)
    want = (
        jax.lax.dot_general(
            x_q, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        * a
        * w_s[None]
        + b
    )
    got = gemv_ops.gemv_w4(
        x_q, a.reshape(1), jnp.asarray(w_p), jnp.asarray(w_s),
        jnp.asarray(b), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
    # int4 per-channel quantization itself stays a bounded approximation
    ref = np.asarray(x) @ w + b[None]
    rel = np.linalg.norm(np.asarray(got) - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.25, rel


def test_mlp_w4_matches_blockwise_reference(rng):
    _, fc_p, s1, b1 = _w4_weights(rng, D, FH)
    _, fc2_p, s2, b2 = _w4_weights(rng, FH, D, cols=True)
    x = jnp.asarray(rng.standard_normal((1, D)), jnp.float32) * 0.5
    x_q, a = _quant_row(x)
    got = np.asarray(
        gemv_ops.mlp_w4(
            x_q, a.reshape(1), jnp.asarray(fc_p), jnp.asarray(s1),
            jnp.asarray(b1), jnp.asarray(fc2_p), jnp.asarray(s2),
            jnp.asarray(b2), interpret=True,
        )
    )
    # step-by-step reference with the kernel's per-block activation quant
    q1 = np.asarray(gemv_ops.unpack_w4(jnp.asarray(fc_p), axis=0), np.int32)
    q2 = np.asarray(gemv_ops.unpack_w4(jnp.asarray(fc2_p), axis=1), np.int32)
    hb = gemv_ops._pick_block(
        D // 2, FH, target=gemv_ops._TARGET_TILE_BYTES_W4
    )
    xq = np.asarray(x_q, np.int32)
    h = (xq @ q1).astype(np.float32) * (np.asarray(a) * s1[None]) + b1[None]
    h = 0.5 * h * (
        1.0 + np.tanh(0.7978845608028654 * (h + 0.044715 * h**3))
    )
    out = np.zeros((1, D), np.float32)
    for i in range(FH // hb):
        blk = h[:, i * hb:(i + 1) * hb]
        ha = np.abs(blk).max(axis=-1, keepdims=True) / 127.0 + 1e-12
        hq = np.clip(np.round(blk / ha), -127, 127).astype(np.int32)
        out += (hq @ q2[i * hb:(i + 1) * hb]).astype(np.float32) * (
            ha * s2[None]
        )
    out += b2[None]
    np.testing.assert_allclose(got, out, rtol=1e-4, atol=1e-3)


def _mk_core(gemv_impl):
    return GPT2Core(
        n_layer=2, n_head=4, dtype=jnp.float32, quantize=True, wbits=4,
        attn_impl="xla", pallas_interpret=True, gemv_impl=gemv_impl,
    )


def _rand_int8(rng, params):
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(
            rng.integers(-120, 120, p.shape), jnp.int8
        ) if p.dtype == jnp.int8 else p,
        params,
    )


def test_core_w4_decode_step_gemv_vs_xla(rng):
    """One B=1 decode step through a wbits=4 GPT2Core: the Pallas-W4 route
    matches the XLA unpack fallback (identical qkv/proj contractions; MLP
    within act-quant granularity)."""
    core_x = _mk_core("xla")
    x0 = jnp.asarray(rng.standard_normal((1, 1, D)), jnp.float32) * 0.3
    params = _rand_int8(rng, core_x.init(jax.random.PRNGKey(0), x0)["params"])
    cap = 16
    ks, vs = init_kv_cache(2, 1, 4, cap, D // 4)
    args = dict(
        attention_mask=jnp.ones((1, cap), dtype=bool),
        kv_caches=(ks, vs),
        cache_index=jnp.asarray(3),
        kv_valid_len=jnp.asarray([4]),
    )
    want, kv_w = core_x.apply({"params": params}, x0, **args)
    got, kv_g = _mk_core("pallas").apply({"params": params}, x0, **args)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert float(jnp.max(jnp.abs(want - got))) / scale < 3e-2
    np.testing.assert_allclose(
        np.asarray(kv_w[0]), np.asarray(kv_g[0]), rtol=1e-5, atol=1e-6
    )


def test_core_w4_prefill_unaffected_by_gemv_flag(rng):
    x = jnp.asarray(rng.standard_normal((1, 5, D)), jnp.float32) * 0.3
    core_x = _mk_core("xla")
    params = _rand_int8(rng, core_x.init(jax.random.PRNGKey(0), x)["params"])
    want, _ = core_x.apply({"params": params}, x)
    got, _ = _mk_core("pallas").apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


TINY = None


def _tiny_cfg():
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig

    cm = ConditionModuleConfig(
        output_size=64, attention_heads=2, linear_units=128, num_blocks=1,
    )
    return GPTConfig(
        model_dim=D, heads=4, layers=2, max_mel_tokens=64, max_text_tokens=32,
        number_text_tokens=50, number_mel_codes=36, start_mel_token=34,
        stop_mel_token=35, condition_module=cm, emo_condition_module=cm,
    )


def _init_params(model):
    from indextts_tpu.models.unified_voice import UnifiedVoice

    B, Lt, Lm = 1, 6, 8
    p = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, 16, D)), jnp.zeros((B, Lt), jnp.int32),
        jnp.asarray([Lt]), jnp.zeros((B, Lm), jnp.int32), jnp.asarray([Lm]),
        jnp.zeros((B, D)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, D)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k, v in ph.items():
        p.setdefault(k, v)
    return p


def test_quantize_tree_w4_fidelity_and_decode(rng):
    """quantize_gpt_tree(bits=4) on a small UnifiedVoice: W4 latents stay a
    bounded approximation of the float model's (coarser than W8 but highly
    correlated), and a full W4 decode produces valid tokens through the
    jitted loop with the Pallas kernels (interpret)."""
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
    from indextts_tpu.runtime.torch_convert import quantize_gpt_tree

    cfg = _tiny_cfg()
    fp = UnifiedVoice(cfg)
    params = _init_params(fp)
    q4 = quantize_gpt_tree(params, bits=4)
    qmodel = UnifiedVoice(cfg, quantize_gpt=True, wbits=4)

    args = (
        jnp.asarray(rng.standard_normal((1, 16, D)), jnp.float32),
        jnp.asarray(rng.integers(2, 50, (1, 6)), jnp.int32), jnp.asarray([6]),
        jnp.asarray(rng.integers(0, 34, (1, 8)), jnp.int32), jnp.asarray([8]),
        jnp.asarray(rng.standard_normal((1, D)), jnp.float32),
    )
    want = np.asarray(
        fp.apply({"params": params}, *args,
                 method=UnifiedVoice.forward_latent)
    )
    got = np.asarray(
        qmodel.apply({"params": q4}, *args,
                     method=UnifiedVoice.forward_latent)
    )
    cos = np.sum(want * got) / (
        np.linalg.norm(want) * np.linalg.norm(got) + 1e-9
    )
    assert cos > 0.95, cos  # int4-per-channel; W8 passes 0.995 here

    m4 = UnifiedVoice(cfg, quantize_gpt=True, wbits=4, gemv_impl="pallas",
                      pallas_interpret=True)
    dec = GPTDecoder(m4, cfg, SamplingConfig())
    text = rng.integers(2, 50, (1, 5))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([5]), 5)
    conds = jnp.zeros((1, 34, D))
    res = dec.generate(
        {"params": q4}, conds, jnp.asarray(ids), jnp.asarray(pos),
        jnp.asarray(valid), jax.random.PRNGKey(0), max_new=10,
    )
    codes = np.asarray(res.codes)
    assert codes.shape == (1, 10)
    assert ((codes >= 0) & (codes < 36)).all()
