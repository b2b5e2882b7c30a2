"""Ragged Pallas decode attention vs the XLA reference (interpret mode;
verified compiled on TPU separately)."""

import numpy as np
import pytest

import jax.numpy as jnp

from indextts_tpu.ops.decode_attention import (
    ragged_decode_attention,
    ragged_decode_attention_xla,
)


@pytest.mark.parametrize("valid", [[100, 512, 257], [1, 3, 512], [512, 512, 512]])
def test_ragged_decode_attention_matches_xla(rng, valid):
    B, H, cap, Dh = 3, 4, 512, 64
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    vl = np.asarray(valid, np.int32)
    want = np.asarray(
        ragged_decode_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(vl))
    )
    got = np.asarray(
        ragged_decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(vl),
            blk=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ragged_decode_attention_bf16_cache(rng):
    B, H, cap, Dh = 2, 2, 256, 64
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = jnp.asarray(rng.standard_normal((B, H, cap, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, cap, Dh)), jnp.bfloat16)
    vl = jnp.asarray([100, 256], jnp.int32)
    want = np.asarray(ragged_decode_attention_xla(jnp.asarray(q), k, v, vl))
    got = np.asarray(
        ragged_decode_attention(jnp.asarray(q), k, v, vl, blk=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)


@pytest.mark.parametrize("valid", [[100, 512, 257], [512, 1, 128]])
def test_ragged_decode_attention_transposed(rng, valid):
    """Transposed-cache variant (the TPU-compilable layout: token slices on
    the 128-lane axis); verified compiled+bit-correct on real TPU."""
    from indextts_tpu.ops.decode_attention import ragged_decode_attention_t

    B, H, cap, Dh = 3, 4, 512, 64
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    vl = np.asarray(valid, np.int32)
    want = np.asarray(
        ragged_decode_attention_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(vl)
        )
    )
    got = np.asarray(
        ragged_decode_attention_t(
            jnp.asarray(q),
            jnp.asarray(k.transpose(0, 1, 3, 2)),
            jnp.asarray(v.transpose(0, 1, 3, 2)),
            jnp.asarray(vl),
            blk=128,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_decode_loop_pallas_ragged_matches_xla(rng):
    """Full greedy decode with attn_impl=pallas_ragged (interpret) equals the
    XLA decode path token-for-token."""
    import jax
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

    cfg = GPTConfig(
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
    base = UnifiedVoice(cfg)
    params = base.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64)), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]), jnp.zeros((1, 64)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = base.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k2, v2 in ph.items():
        params.setdefault(k2, v2)
    params = {"params": params}

    B = 2
    conds = jnp.asarray(rng.standard_normal((B, 34, 64)), jnp.float32)
    text = rng.integers(2, 50, (B, 9))
    lens = np.array([9, 5])
    sc = SamplingConfig(do_sample=False, use_repetition_penalty=False)

    dec_x = GPTDecoder(base, cfg, sc)
    ids, pos, valid = dec_x.build_text_prompt_arrays(text, lens, 9)
    want = np.asarray(
        dec_x.generate(
            params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
            jax.random.PRNGKey(0), max_new=12,
        ).codes
    )

    pmodel = UnifiedVoice(cfg, attn_impl="pallas_ragged", pallas_interpret=True)
    dec_p = GPTDecoder(pmodel, cfg, sc)
    got = np.asarray(
        dec_p.generate(
            params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
            jax.random.PRNGKey(0), max_new=12,
        ).codes
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("valid", [[100, 512, 257], [512, 1, 128]])
def test_ragged_decode_attention_blocked(rng, valid):
    """Block-major variant: one DMA per token block carries ALL heads."""
    from indextts_tpu.ops.decode_attention import (
        ragged_decode_attention_blocked,
        to_blocked_cache,
    )

    B, H, cap, Dh, blk = 3, 4, 512, 64, 128
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    vl = np.asarray(valid, np.int32)
    want = np.asarray(
        ragged_decode_attention_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(vl)
        )
    )
    kb = to_blocked_cache(jnp.asarray(k), blk)
    vb = to_blocked_cache(jnp.asarray(v), blk)
    assert kb.shape == (B, cap // blk, H, Dh, blk)
    got = np.asarray(
        ragged_decode_attention_blocked(
            jnp.asarray(q), kb, vb, jnp.asarray(vl), interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ragged_decode_attention_blocked_hole(rng):
    """The left-pad hole [hole_s, hole_e) is excluded from attention."""
    from indextts_tpu.ops.decode_attention import (
        ragged_decode_attention_blocked,
        to_blocked_cache,
    )

    B, H, cap, Dh, blk = 2, 3, 256, 64, 128
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    vl = np.asarray([200, 256], np.int32)
    hs = np.asarray([10, 0], np.int32)
    he = np.asarray([50, 0], np.int32)
    # XLA reference with the hole masked manually
    s = np.einsum("bhd,bhsd->bhs", q, k) / np.sqrt(Dh)
    pos = np.arange(cap)
    mask = (pos[None, :] < vl[:, None]) & ~(
        (pos[None, :] >= hs[:, None]) & (pos[None, :] < he[:, None])
    )
    s = np.where(mask[:, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhs,bhsd->bhd", p, v)
    got = np.asarray(
        ragged_decode_attention_blocked(
            jnp.asarray(q), to_blocked_cache(jnp.asarray(k), blk),
            to_blocked_cache(jnp.asarray(v), blk), jnp.asarray(vl),
            interpret=True, hole_start=jnp.asarray(hs), hole_end=jnp.asarray(he),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_decode_loop_xla_bucketed_matches_xla(rng):
    """attn_impl=xla_bucketed (lax.switch over static prefix slices) is
    token-identical to the full-cap XLA decode path: every excluded position
    carried NEG_INF bias whose softmax weight is an exact 0.0."""
    import jax
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

    cfg = GPTConfig(
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
    base = UnifiedVoice(cfg)
    params = base.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64)), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]), jnp.zeros((1, 64)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = base.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k2, v2 in ph.items():
        params.setdefault(k2, v2)
    params = {"params": params}

    B = 2
    conds = jnp.asarray(rng.standard_normal((B, 34, 64)), jnp.float32)
    text = rng.integers(2, 50, (B, 9))
    lens = np.array([9, 5])
    # sampled decode so the bucketed path also covers the stochastic chain
    sc = SamplingConfig(do_sample=True)

    dec_x = GPTDecoder(UnifiedVoice(cfg), cfg, sc)
    ids, pos, valid = dec_x.build_text_prompt_arrays(text, lens, 9)
    want = dec_x.generate(
        params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        jax.random.PRNGKey(5), max_new=12,
    )

    dec_b = GPTDecoder(UnifiedVoice(cfg, attn_impl="xla_bucketed"), cfg, sc)
    got = dec_b.generate(
        params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        jax.random.PRNGKey(5), max_new=12,
    )
    np.testing.assert_array_equal(np.asarray(got.codes), np.asarray(want.codes))
    np.testing.assert_array_equal(
        np.asarray(got.lengths), np.asarray(want.lengths)
    )


def test_gpt2core_bucketed_step_multi_branch(rng):
    """Step-level check of the static prefix slice (cap 640): a decode step
    with prefix_limit >= valid equals the full-cap step numerically (the
    shorter static contraction reorders the f32 reduction tree, so agreement
    is to rounding, not bitwise; the decode-loop tests assert token
    equality), at valid lengths around bucket boundaries."""
    import jax
    from indextts_tpu.models.gpt2 import GPT2Core, init_kv_cache

    L_, B, H, Dh, cap = 2, 2, 4, 16, 640
    D = H * Dh
    core = GPT2Core(L_, H)
    x0 = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    ks, vs = init_kv_cache(L_, B, H, cap, Dh)
    ks = jnp.asarray(rng.standard_normal(ks.shape), jnp.float32) * 0.3
    vs = jnp.asarray(rng.standard_normal(vs.shape), jnp.float32) * 0.3
    params = core.init(
        jax.random.PRNGKey(0), x0, None, (ks, vs), jnp.asarray(0),
        jnp.full((B,), 1, jnp.int32),
    )
    mask = jnp.ones((B, cap), bool).at[0, 3:7].set(False)  # a left-pad hole
    for n, limit in ((5, 256), (255, 256), (256, 256), (257, 512), (511, 512),
                     (639, 640)):
        idx = jnp.asarray(n, jnp.int32)
        vl = jnp.full((B,), n + 1, jnp.int32)
        out_x, _ = core.apply(params, x0, mask, (ks, vs), idx, vl)
        out_b, _ = core.apply(params, x0, mask, (ks, vs), idx, vl,
                              prefix_limit=limit)
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_b),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("variant", ["dma", "grid"])
@pytest.mark.parametrize("valid,holes", [
    ([100, 512, 257], None),
    ([512, 1, 384], ([34, 0, 40], [60, 0, 90])),
])
def test_ragged_decode_attention_blocked_q8(rng, valid, holes, variant,
                                            monkeypatch):
    """int8 block-major kernels (manual-DMA and grid-pipelined variants) vs
    the XLA reference of the same quant math."""
    monkeypatch.setenv("TARS_Q8_VARIANT", variant)
    from indextts_tpu.models.gpt2 import quantize_kv
    from indextts_tpu.ops.decode_attention import (
        ragged_decode_attention_blocked_q8,
        ragged_decode_attention_q8_xla,
        to_blocked_cache,
        to_blocked_scales,
    )

    B, H, cap, Dh, blk = 3, 4, 512, 64, 128
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, cap, Dh)).astype(np.float32)
    k8, ksc = quantize_kv(jnp.asarray(k))   # (B,H,cap,Dh) int8, (B,H,cap)
    v8, vsc = quantize_kv(jnp.asarray(v))
    k8_b = to_blocked_cache(k8, blk)        # (B,NB,H,Dh,blk)
    v8_b = to_blocked_cache(v8, blk)
    ksc_b = to_blocked_scales(ksc, blk)     # (B,NB,Hp,blk)
    vsc_b = to_blocked_scales(vsc, blk)
    vl = jnp.asarray(valid, jnp.int32)
    hs = he = None
    if holes is not None:
        hs = jnp.asarray(holes[0], jnp.int32)
        he = jnp.asarray(holes[1], jnp.int32)
    want = np.asarray(ragged_decode_attention_q8_xla(
        jnp.asarray(q), k8_b, v8_b, ksc_b, vsc_b, vl, hs, he))
    got = np.asarray(ragged_decode_attention_blocked_q8(
        jnp.asarray(q), k8_b, v8_b, ksc_b, vsc_b, vl,
        interpret=True, hole_start=hs, hole_end=he))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_decode_loop_pallas_q8_matches_kv_quant_xla(rng):
    """Full greedy decode with attn_impl=pallas_q8 (interpret) equals the
    int8-XLA (kv_quant) decode path token-for-token: both quantize the same
    KV the same way; the kernel only changes where the dequant runs."""
    import jax
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

    cfg = GPTConfig(
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
    base = UnifiedVoice(cfg, kv_quant=True)
    params = base.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64)), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]), jnp.zeros((1, 64)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = base.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k2, v2 in ph.items():
        params.setdefault(k2, v2)
    params = {"params": params}

    B = 2
    conds = jnp.asarray(rng.standard_normal((B, 34, 64)), jnp.float32)
    text = rng.integers(2, 50, (B, 9))
    lens = np.array([9, 5])
    sc = SamplingConfig(do_sample=False, use_repetition_penalty=False)

    dec_x = GPTDecoder(base, cfg, sc)
    ids, pos, valid = dec_x.build_text_prompt_arrays(text, lens, 9)
    want = np.asarray(
        dec_x.generate(
            params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
            jax.random.PRNGKey(0), max_new=12,
        ).codes
    )

    pmodel = UnifiedVoice(cfg, attn_impl="pallas_q8", pallas_interpret=True)
    dec_p = GPTDecoder(pmodel, cfg, sc)
    dec_p.BLKQ = 32  # multiple blocks even at tiny cap
    got = np.asarray(
        dec_p.generate(
            params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
            jax.random.PRNGKey(0), max_new=12,
        ).codes
    )
    np.testing.assert_array_equal(got, want)


def test_attn_impl_auto_dispatch(rng):
    """attn_impl="auto" (the serving default) resolves the decoder to the xla
    path (the measured winner at every batch size), and — when the opt-in
    pallas_q8 sibling exists (TARS_Q8_SIBLING=1) — routes exactly the
    B=1/no-prefix generate calls through it, token-identically."""
    import jax
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

    cfg = GPTConfig(
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
    base = UnifiedVoice(cfg, kv_quant=True)
    params = base.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64)), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]), jnp.zeros((1, 64)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = base.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k2, v2 in ph.items():
        params.setdefault(k2, v2)
    params = {"params": params}
    sc = SamplingConfig(do_sample=False, use_repetition_penalty=False)

    amodel = UnifiedVoice(cfg, kv_quant=True, attn_impl="auto")
    dec = GPTDecoder(amodel, cfg, sc)
    # resolution: decoder runs xla(+kv_quant); no sibling on a CPU host
    assert dec.model.attn_impl == "xla"
    assert dec.model.kv_quant
    assert dec._q8_sibling is None

    # simulate the TPU sibling with the interpret-mode kernel
    dec._q8_sibling = GPTDecoder(
        amodel.clone(attn_impl="pallas_q8", kv_quant=False,
                     pallas_interpret=True),
        cfg, sc,
    )
    dec._q8_sibling.BLKQ = 32
    calls = []
    inner = dec._q8_sibling.generate
    dec._q8_sibling.generate = lambda *a, **kw: (
        calls.append(1) or inner(*a, **kw)
    )

    text = rng.integers(2, 50, (1, 9))
    conds1 = jnp.asarray(rng.standard_normal((1, 34, 64)), jnp.float32)
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([9]), 9)
    args1 = (params, conds1, jnp.asarray(ids), jnp.asarray(pos),
             jnp.asarray(valid))
    want = np.asarray(
        GPTDecoder(base, cfg, sc).generate(
            *args1, jax.random.PRNGKey(0), max_new=12).codes
    )
    got = np.asarray(dec.generate(*args1, jax.random.PRNGKey(0), max_new=12).codes)
    np.testing.assert_array_equal(got, want)
    assert calls == [1]  # B=1 routed through the q8 sibling

    # B=2 stays on the xla path
    text2 = rng.integers(2, 50, (2, 9))
    conds2 = jnp.asarray(rng.standard_normal((2, 34, 64)), jnp.float32)
    ids2, pos2, valid2 = dec.build_text_prompt_arrays(text2, np.array([9, 5]), 9)
    dec.generate(params, conds2, jnp.asarray(ids2), jnp.asarray(pos2),
                 jnp.asarray(valid2), jax.random.PRNGKey(0), max_new=8)
    assert calls == [1]

    # kv_quant decoders support prefix reuse since r3 (float prefix cached,
    # combined KV quantized after the tail chunk — test_prefix_kv proves
    # bit-parity); the Pallas layouts still re-prefill
    assert dec.supports_cond_kv
    assert not GPTDecoder(
        UnifiedVoice(cfg, attn_impl="pallas_q8"), cfg, sc
    ).supports_cond_kv

    # float-cache auto decoder: prefix-KV calls stay on the xla path (the
    # sibling keeps its own layout)
    decf = GPTDecoder(UnifiedVoice(cfg, attn_impl="auto"), cfg, sc)
    assert decf.supports_cond_kv
    decf._q8_sibling = dec._q8_sibling
    ck = decf.cond_prefill(params, conds1)
    decf.generate(*args1, jax.random.PRNGKey(0), max_new=8, cond_kv=ck)
    assert calls == [1]
