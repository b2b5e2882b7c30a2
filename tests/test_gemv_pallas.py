"""Streaming int8 GEMV/MLP Pallas kernels (ops/gemv.py) for the B=1 decode
step: contraction parity with the XLA W8A8 path and GPT2Core integration.

Run in interpret mode on CPU; the TPU win is benchmarked separately
(ARCHITECTURE.md perf notes: XLA W8A8 GEMVs run at ~60% of the v5e HBM
roofline; these kernels stream each weight byte exactly once)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.models.gpt2 import (
    GPT2Core,
    _quant_row,
    gelu_new,
    init_kv_cache,
    quantize_conv1d_params,
)
from indextts_tpu.ops import gemv as gemv_ops

D, FH = 256, 1024


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _q8_weights(rng, d, f):
    w = rng.standard_normal((d, f)).astype(np.float32) * 0.02
    t = quantize_conv1d_params(
        {"kernel": w, "bias": rng.standard_normal(f).astype(np.float32) * 0.01}
    )
    return t["kernel_q"], t["kernel_scale"], t["bias"]


def test_supports_gating():
    assert gemv_ops.supports(1280, 3840)
    assert gemv_ops.supports_mlp(1280, 5120)
    assert not gemv_ops.supports(64, 256)  # tiny test dims fall back
    assert not gemv_ops.supports(1280, 100)  # unblockable out dim


def test_gemv_matches_xla_contraction(rng):
    w_q, w_s, b = _q8_weights(rng, D, 768)
    x = jnp.asarray(rng.standard_normal((1, D)), jnp.float32) * 0.5
    x_q, a = _quant_row(x)
    want = (
        jax.lax.dot_general(
            x_q, jnp.asarray(w_q), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        * a
        * w_s[None]
        + b
    )
    got = gemv_ops.gemv_w8(
        x_q, a.reshape(1), jnp.asarray(w_q), jnp.asarray(w_s),
        jnp.asarray(b), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_mlp_close_to_float_and_xla(rng):
    w1, s1, b1 = _q8_weights(rng, D, FH)
    w2, s2, b2 = _q8_weights(rng, FH, D)
    x = jnp.asarray(rng.standard_normal((1, D)), jnp.float32) * 0.5
    x_q, a = _quant_row(x)

    got = np.asarray(
        gemv_ops.mlp_w8(
            x_q, a.reshape(1), jnp.asarray(w1), jnp.asarray(s1),
            jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(s2),
            jnp.asarray(b2), interpret=True,
        )
    )[0]

    # float reference (dequantized weights)
    h = np.asarray(x)[0] @ (np.asarray(w1, np.float32) * s1[None]) + b1
    h = np.asarray(gelu_new(jnp.asarray(h)))
    want_f = h @ (np.asarray(w2, np.float32) * s2[None]) + b2
    scale = np.abs(want_f).max() + 1e-9
    assert np.abs(got - want_f).max() / scale < 2e-2

    # XLA W8A8 path (per-row hidden act quant; kernel quantizes per block —
    # finer granularity, so equal only within quantization error)
    h_xla = (
        np.asarray(
            jax.lax.dot_general(
                x_q, jnp.asarray(w1), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        )
        * np.asarray(a)
        * s1[None]
        + b1
    )
    h_xla = np.asarray(gelu_new(jnp.asarray(h_xla)))
    hq, ha = _quant_row(jnp.asarray(h_xla))
    want_q = (
        np.asarray(
            jax.lax.dot_general(
                hq, jnp.asarray(w2), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        )
        * np.asarray(ha)
        * s2[None]
        + b2
    )
    assert np.abs(got - want_q[0]).max() / scale < 2e-2


def _mk_core(gemv_impl):
    return GPT2Core(
        n_layer=2, n_head=4, dtype=jnp.float32, quantize=True,
        attn_impl="xla", pallas_interpret=True, gemv_impl=gemv_impl,
    )


def test_core_decode_step_gemv_vs_xla(rng):
    """One B=1 decode step through GPT2Core: the Pallas-GEMV trace matches
    the XLA trace (identical qkv/proj contractions; MLP within act-quant
    granularity)."""
    core_x = _mk_core("xla")
    x0 = jnp.asarray(rng.standard_normal((1, 1, D)), jnp.float32) * 0.3
    params = core_x.init(jax.random.PRNGKey(0), x0)["params"]
    # non-trivial int8 weights (init gives zeros)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(
            rng.integers(-80, 80, p.shape), jnp.int8
        ) if p.dtype == jnp.int8 else p,
        params,
    )

    cap = 16
    ks, vs = init_kv_cache(2, 1, 4, cap, D // 4)
    mask = jnp.ones((1, cap), dtype=bool)
    args = dict(
        attention_mask=mask,
        kv_caches=(ks, vs),
        cache_index=jnp.asarray(3),
        kv_valid_len=jnp.asarray([4]),
    )
    want, kv_w = core_x.apply({"params": params}, x0, **args)
    got, kv_g = _mk_core("pallas").apply({"params": params}, x0, **args)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert float(jnp.max(jnp.abs(want - got))) / scale < 3e-2
    # caches must be written identically (same k/v projections)
    np.testing.assert_allclose(
        np.asarray(kv_w[0]), np.asarray(kv_g[0]), rtol=1e-5, atol=1e-6
    )


def test_core_prefill_unaffected_by_gemv_flag(rng):
    """Prefill (T>1) never routes through the kernels: outputs identical."""
    x = jnp.asarray(rng.standard_normal((1, 5, D)), jnp.float32) * 0.3
    core_x = _mk_core("xla")
    params = core_x.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(
            rng.integers(-80, 80, p.shape), jnp.int8
        ) if p.dtype == jnp.int8 else p,
        params,
    )
    want, _ = core_x.apply({"params": params}, x)
    got, _ = _mk_core("pallas").apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_generate_with_gemv_and_q8_attention(rng, monkeypatch):
    """Both kernel families in one decode program (interpret): the gemv MLP
    + grid-variant q8 attention compose without tracing/aliasing conflicts."""
    monkeypatch.setenv("TARS_Q8_VARIANT", "grid")
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
    from indextts_tpu.runtime.torch_convert import quantize_gpt_tree

    cfg = GPTConfig(
        model_dim=D, layers=2, heads=4, max_mel_tokens=64, max_text_tokens=32,
        number_text_tokens=50, number_mel_codes=36, start_mel_token=34,
        stop_mel_token=35,
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=48, attention_heads=4, num_blocks=1
        ),
        emo_condition_module=ConditionModuleConfig(
            output_size=32, linear_units=32, attention_heads=2, num_blocks=1
        ),
    )
    fp = UnifiedVoice(cfg)
    B, Lt, Lm = 1, 6, 8
    p = fp.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 32, D)),
        jnp.zeros((B, Lt), jnp.int32), jnp.asarray([Lt]),
        jnp.zeros((B, Lm), jnp.int32), jnp.asarray([Lm]), jnp.zeros((B, D)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = fp.init(
        jax.random.PRNGKey(1), jnp.zeros((1, D)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k, v in ph.items():
        p.setdefault(k, v)
    qp = quantize_gpt_tree(p)

    qmodel = UnifiedVoice(
        cfg, quantize_gpt=True, attn_impl="pallas_q8",
        gemv_impl="pallas", pallas_interpret=True,
    )
    dec = GPTDecoder(qmodel, cfg, SamplingConfig(do_sample=False))
    dec.BLKQ = 32
    text = rng.integers(2, 50, (1, 5))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([5]), 5)
    conds = jnp.asarray(rng.standard_normal((1, 34, D)), jnp.float32) * 0.1
    res = dec.generate(
        {"params": qp}, conds, jnp.asarray(ids), jnp.asarray(pos),
        jnp.asarray(valid), jax.random.PRNGKey(0), max_new=8,
    )
    codes = np.asarray(res.codes)
    assert codes.shape == (1, 8)
    assert ((codes >= 0) & (codes < 36)).all()

    # reference: same weights, pure-XLA trace — greedy tokens should agree
    # for these well-separated random logits (MLP act-quant granularity is
    # the only numeric difference)
    xmodel = UnifiedVoice(cfg, quantize_gpt=True, attn_impl="xla",
                          gemv_impl="xla")
    dx = GPTDecoder(xmodel, cfg, SamplingConfig(do_sample=False))
    rx = dx.generate(
        {"params": qp}, conds, jnp.asarray(ids), jnp.asarray(pos),
        jnp.asarray(valid), jax.random.PRNGKey(0), max_new=8,
    )
    assert (codes == np.asarray(rx.codes)).all()


def test_gemv_multirow_beam_shape(rng):
    """b=3 rows (the engine's default beam route is num_beams=3): per-row
    activation scales apply correctly."""
    w_q, w_s, b = _q8_weights(rng, D, 768)
    x = jnp.asarray(rng.standard_normal((3, D)), jnp.float32) * 0.5
    x_q, a = _quant_row(x)
    want = (
        jax.lax.dot_general(
            x_q, jnp.asarray(w_q), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        * a
        * w_s[None]
        + b
    )
    got = gemv_ops.gemv_w8(
        x_q, a, jnp.asarray(w_q), jnp.asarray(w_s), jnp.asarray(b),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )

    w1, s1, b1 = _q8_weights(rng, D, FH)
    w2, s2, b2 = _q8_weights(rng, FH, D)
    got_m = np.asarray(
        gemv_ops.mlp_w8(
            x_q, a, jnp.asarray(w1), jnp.asarray(s1), jnp.asarray(b1),
            jnp.asarray(w2), jnp.asarray(s2), jnp.asarray(b2), interpret=True,
        )
    )
    h = np.asarray(x) @ (np.asarray(w1, np.float32) * s1[None]) + b1
    h = np.asarray(gelu_new(jnp.asarray(h)))
    want_f = h @ (np.asarray(w2, np.float32) * s2[None]) + b2
    scale = np.abs(want_f).max() + 1e-9
    assert np.abs(got_m - want_f).max() / scale < 2e-2
