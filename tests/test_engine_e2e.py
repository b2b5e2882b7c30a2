"""End-to-end smoke test: the full 5-model cascade with random weights on a
tiny config — conditioning -> AR decode -> latent -> CFM -> vocoder."""

import dataclasses

import numpy as np
import pytest

from indextts_tpu.config import (
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
from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params


def tiny_config() -> IndexTTS2Config:
    return IndexTTS2Config(
        gpt=GPTConfig(
            model_dim=64,
            layers=2,
            heads=4,
            max_mel_tokens=64,
            max_text_tokens=32,
            number_text_tokens=50,
            number_mel_codes=36,
            start_mel_token=34,
            stop_mel_token=35,
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=48, attention_heads=4, num_blocks=1
            ),
            emo_condition_module=ConditionModuleConfig(
                output_size=32, linear_units=32, attention_heads=2, num_blocks=1
            ),
        ),
        semantic_codec=SemanticCodecConfig(
            codebook_size=36, hidden_size=1024, codebook_dim=8, vocos_dim=24,
            vocos_intermediate_dim=32, vocos_num_layers=1,
        ),
        s2mel=S2MelConfig(
            length_regulator=LengthRegulatorConfig(channels=32, in_channels=1024),
            dit=DiTConfig(hidden_dim=32, num_heads=4, depth=3, in_channels=80,
                          content_dim=32, style_dim=192),
            wavenet=WaveNetConfig(hidden_dim=32, num_layers=2, kernel_size=5),
            gpt_dims=(64, 16, 8, 1024),
        ),
        vocoder=BigVGANConfig(
            num_mels=80,
            upsample_rates=(8, 8, 4),
            upsample_kernel_sizes=(16, 16, 8),
            upsample_initial_channel=16,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        ),
        w2vbert=W2VBertConfig(
            hidden_size=1024, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, tap_layer=2, conv_depthwise_kernel_size=7,
        ),
        campplus=CampPlusConfig(),
        runtime=RuntimeConfig(diffusion_steps=2, max_mel_tokens=24),
    )


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_config()
    params = random_params(cfg, seed=0)
    return IndexTTS2Engine(cfg, params)


def test_precompile_covers_serving_envelope(engine, rng):
    """precompile() must compile every program a subsequent in-envelope
    request needs: the request after it may not add a single new compile
    key (engine.py precompile; the serving wiring is serve.py's background
    thread)."""
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    spk = engine.prepare_speaker(prompt, sr, cache_key="precompile")
    n = engine.precompile(spk, max_code_len=64, workers=2)
    assert n > 0

    progs = {
        "latent": engine._latent_program,
        "s2mel": engine._s2mel_program,
        "vocoder": engine._vocoder_pcm16_program
        if engine.cfg.runtime.device_pcm16
        else engine._vocoder_program,
        "beam": engine.decoder._beam_jit,  # default route: num_beams=3
    }
    before = {k: p._cache_size() for k, p in progs.items()}

    text = rng.integers(2, 50, 7)
    out = engine.infer((prompt, sr), [text], seed=3)
    assert np.isfinite(out["audio"]).all()

    after = {k: p._cache_size() for k, p in progs.items()}
    assert after == before, f"request added compiles: {before} -> {after}"


def test_e2e_synthesis(engine, rng):
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    text = rng.integers(2, 50, 7)
    out = engine.infer((prompt, sr), [text], seed=0)
    assert out["sampling_rate"] == 22050
    wav = out["audio"]
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()
    # vocoder upsample factor of the tiny config is 256 as well
    assert len(wav) % 256 == 0


def test_e2e_two_segments_with_silence(engine, rng):
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 6)]
    out = engine.infer((prompt, sr), segs, seed=1, interval_silence=100)
    assert len(out["stats"]) == 2
    assert out["duration_sec"] > 0


def test_e2e_stage_sync_sequential(engine, rng, monkeypatch):
    """TARS_STAGE_SYNC=1 inserts per-stage barriers in the SEQUENTIAL path
    too (r3 published a dispatch-skewed table: s2mel 0.011 s with the wait
    smeared into bigvgan). Audio must be identical to the async run and
    every stage clock must be positive."""
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    text = rng.integers(2, 50, 6)
    base = engine.infer((prompt, sr), [text], seed=8)
    monkeypatch.setenv("TARS_STAGE_SYNC", "1")
    synced = engine.infer((prompt, sr), [text], seed=8)
    np.testing.assert_array_equal(base["audio"], synced["audio"])
    s = synced["stats"][0]
    for v in (s.gpt_gen_time, s.gpt_forward_time, s.s2mel_time, s.bigvgan_time):
        assert v > 0


def test_e2e_emotion_vector(engine, rng):
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    vec = engine.normalize_emo_vec([0, 0, 1.0, 0, 0, 0, 0, 0])
    out = engine.infer((prompt, sr), [rng.integers(2, 50, 4)], emo_vector=vec, seed=2)
    assert np.isfinite(out["audio"]).all()


def test_e2e_batched_segments(engine, rng):
    """batched=True runs all segments through one AR loop and produces
    per-segment audio of the expected lengths."""
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 8), rng.integers(2, 50, 3)]
    out = engine.infer((prompt, sr), segs, seed=3, batched=True)
    assert out["duration_sec"] > 0
    assert np.isfinite(out["audio"]).all()


def test_e2e_beam_modes(engine, rng):
    """Default config routes num_beams=3 through the jitted beam (sampling and
    deterministic); num_beams=1 uses the pure-sampling loop (accel analog)."""
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    text = rng.integers(2, 50, 5)
    # beam-multinomial (reference default serving config)
    bs = engine.infer((prompt, sr), [text], seed=11)  # num_beams=3 from config
    assert np.isfinite(bs["audio"]).all()
    # deterministic beam
    det = engine.infer((prompt, sr), [text], seed=11, do_sample=False)
    assert np.isfinite(det["audio"]).all()
    # pure sampling path
    sp = engine.infer((prompt, sr), [text], seed=11, num_beams=1)
    assert np.isfinite(sp["audio"]).all()


def test_use_emo_text_drives_matrix_blend(engine, rng):
    """infer_text(use_emo_text=True) must route the Qwen vector into the
    emotion-matrix blend (serve.py/webui mode 3; infer_v2.py:586-598)."""
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)

    class FakeTok:
        def tokenize(self, text):
            return list(text)

        def split_segments(self, pieces, max_seg, quick_streaming_tokens=0):
            return [pieces[:5]]

        def convert_tokens_to_ids(self, toks):
            return [2 + (ord(t) % 40) for t in toks]

    class FakeQwen:
        def inference(self, text):
            return {"happy": 0.0, "angry": 0.0, "sad": 0.8, "afraid": 0.0,
                    "disgusted": 0.0, "melancholic": 0.0, "surprised": 0.0,
                    "calm": 0.0}

    engine.tokenizer = FakeTok()
    engine.qwen_emo = FakeQwen()
    seen = {}
    orig = engine._emovec_from_matrix

    def spy(emo_vector, style, use_random):
        seen["vec"] = list(emo_vector)
        return orig(emo_vector, style, use_random)

    engine._emovec_from_matrix = spy
    try:
        out = engine.infer_text((prompt, sr), "hello world", use_emo_text=True,
                                seed=3)
        assert np.isfinite(out["audio"]).all()
        assert seen["vec"][2] == 0.8  # the sad component drove the blend
    finally:
        engine.tokenizer = None
        engine.qwen_emo = None
        engine._emovec_from_matrix = orig


def test_use_emo_text_without_qwen_raises(engine):
    class FakeTok:
        def tokenize(self, text):
            return list(text)

        def split_segments(self, pieces, max_seg, quick_streaming_tokens=0):
            return [pieces[:4]]

        def convert_tokens_to_ids(self, toks):
            return [2] * len(toks)

    engine.tokenizer = FakeTok()
    engine.qwen_emo = None
    try:
        with pytest.raises(ValueError, match="qwen_emo"):
            engine.infer_text((np.zeros(16000, np.float32), 16000), "hi",
                              use_emo_text=True)
    finally:
        engine.tokenizer = None


def test_bf16_param_store_dtypes(rng):
    """bf16-bundle engines store float params in bf16 (host-cast before the
    device transfer — halves startup h2d bytes); int8 dequant scales stay
    fp32 (put_as contract)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(
            cfg.runtime, s2mel_dtype="bfloat16", voc_dtype="bfloat16",
            gpt_quantize=True, kv_quant=True,
        ),
    )
    eng = IndexTTS2Engine(cfg, random_params(cfg, seed=0),
                          gpt_dtype=jnp.bfloat16)
    for tree in (eng.p_s2mel, eng.p_bigvgan):
        dts = {
            str(l.dtype)
            for _, l in jax.tree_util.tree_leaves_with_path(tree)
            if jnp.issubdtype(l.dtype, jnp.floating)
        }
        assert dts == {"bfloat16"}, dts
    # quantized GPT: int8 kernels, fp32 scales, bf16 everything else float
    flat = jax.tree_util.tree_leaves_with_path(eng.p_gpt)
    scales = [l for p, l in flat
              if any(getattr(k, "key", None) == "kernel_scale" for k in p)]
    assert scales and all(l.dtype == jnp.float32 for l in scales)
    others = {
        str(l.dtype) for p, l in flat
        if jnp.issubdtype(l.dtype, jnp.floating)
        and not any(getattr(k, "key", None) == "kernel_scale" for k in p)
    }
    assert others == {"bfloat16"}, others
    # fp32 vocoder sibling for the B=1 path
    dts32 = {
        str(l.dtype)
        for _, l in jax.tree_util.tree_leaves_with_path(eng.p_bigvgan_f32)
        if jnp.issubdtype(l.dtype, jnp.floating)
    }
    assert dts32 == {"float32"}


def test_emoconds_cache_keyable_requests(engine, rng, tmp_path):
    """File-path (keyable) requests cache (emovec, conds) and skip the two
    per-segment conditioning dispatches on repeats — byte-identical audio
    with the same seed."""
    from indextts_tpu.utils.audio import save_wav

    sr = 16000
    wav = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    p = tmp_path / "spk.wav"
    save_wav(str(p), wav, sr)
    text = rng.integers(2, 50, 6)

    engine._emoconds_cache.clear()
    a = engine.infer(str(p), [text], seed=4)
    assert len(engine._emoconds_cache) == 1
    b = engine.infer(str(p), [text], seed=4)
    np.testing.assert_array_equal(a["audio"], b["audio"])
    assert len(engine._emoconds_cache) == 1
    # array-input (unkeyable) requests bypass the cache
    engine.infer((wav, sr), [text], seed=4)
    assert len(engine._emoconds_cache) == 1


def test_infer_text_quick_streaming_passthrough(engine, rng, monkeypatch):
    """infer_text forwards quick_streaming_tokens to the segment splitter
    (streaming first-chunk lever, infer_v2.py:573,700)."""
    seen = {}

    class FakeTok:
        def tokenize(self, text):
            return list(text)

        def split_segments(self, pieces, max_seg, quick_streaming_tokens=0):
            seen["quick"] = quick_streaming_tokens
            return [pieces[:4]]

        def convert_tokens_to_ids(self, toks):
            return [2 + (ord(t) % 40) for t in toks]

    monkeypatch.setattr(engine, "tokenizer", FakeTok())
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    engine.infer_text((prompt, sr), "quick streaming", seed=1,
                      quick_streaming_tokens=7)
    assert seen["quick"] == 7


def test_seq_tail_overlap_waveform_parity(engine, rng, monkeypatch):
    """The pipelined sequential route (tail k overlaps decode k+1, the
    serving default) must be waveform-identical to the inline path for
    seeded requests — infer() and infer_generator(), multi-segment."""
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 7),
            rng.integers(2, 50, 4)]

    assert engine._seq_tail_overlap_enabled(len(segs))
    piped = engine.infer((prompt, sr), segs, seed=6, interval_silence=100)
    gen_piped = np.concatenate(
        list(engine.infer_generator((prompt, sr), segs, seed=6,
                                    interval_silence=100))
    )
    monkeypatch.setenv("TARS_SEQ_TAIL_OVERLAP", "0")
    inline_cfg = dataclasses.replace(
        engine.cfg, runtime=dataclasses.replace(
            engine.cfg.runtime, seq_tail_overlap=False)
    )
    monkeypatch.setattr(engine, "cfg", inline_cfg)
    assert not engine._seq_tail_overlap_enabled(len(segs))
    inline = engine.infer((prompt, sr), segs, seed=6, interval_silence=100)
    gen_inline = np.concatenate(
        list(engine.infer_generator((prompt, sr), segs, seed=6,
                                    interval_silence=100))
    )
    np.testing.assert_array_equal(piped["audio"], inline["audio"])
    np.testing.assert_array_equal(gen_piped, gen_inline)
    # generator streams a trailing inter-segment silence; infer() does not
    n_sil = int(22050 * 100 / 1000)
    np.testing.assert_array_equal(piped["audio"], gen_inline[:-n_sil])
    assert len(piped["stats"]) == 3


def test_seq_tail_overlap_decode_error_propagates(engine, rng, monkeypatch):
    """A decode failure inside the pipeline's producer thread surfaces to
    the caller instead of hanging the queue."""
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 6)]

    def boom(*a, **k):
        raise RuntimeError("decode exploded")

    monkeypatch.setattr(engine, "_decode_segment_codes", boom)
    with pytest.raises(RuntimeError, match="decode exploded"):
        engine.infer((prompt, sr), segs, seed=0)
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(engine.infer_generator((prompt, sr), segs, seed=0))


def test_infer_generator_keyed_matches_infer(engine, rng, tmp_path):
    """The streaming generator's new keyable-conditioning reuse (cond_kv /
    emoconds caches, r5) must not change audio: file-path prompt, same
    seed, generator output == infer() output, and the caches are shared."""
    from indextts_tpu.utils.audio import save_wav

    sr = 16000
    wav = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    p = tmp_path / "spk_gen.wav"
    save_wav(str(p), wav, sr)
    segs = [rng.integers(2, 50, 5), rng.integers(2, 50, 6)]

    engine._emoconds_cache.clear()
    got = np.concatenate(
        list(engine.infer_generator(str(p), segs, seed=12, interval_silence=0))
    )
    assert len(engine._emoconds_cache) == 1  # generator populated the cache
    want = engine.infer(str(p), segs, seed=12, interval_silence=0)["audio"]
    np.testing.assert_array_equal(got, want)
