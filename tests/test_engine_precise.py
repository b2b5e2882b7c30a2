"""Engine precise_shapes (parity) mode + training step sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.test_engine_e2e import tiny_config
from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params


def test_precise_mode_e2e(rng):
    cfg = tiny_config()
    params = random_params(cfg, seed=0)
    engine = IndexTTS2Engine(cfg, params, precise_shapes=True)
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    out = engine.infer((prompt, sr), [rng.integers(2, 50, 6)], seed=0)
    assert np.isfinite(out["audio"]).all()
    # precise mode: wav length is exactly codes*1.72 frames * upsample
    n = out["stats"][0].codes_len
    assert len(out["stats"][0].wav) == int(n * 1.72) * cfg.vocoder.total_upsample


def test_bucketed_matches_precise_waveform(rng):
    """The default bucketed mode must produce the same audio as the
    exact-shape parity mode: per-sequence regulator grid, masked GroupNorm,
    valid-boundary WN reflect, canonical noise (ADVICE r1 high-severity)."""
    cfg = tiny_config()
    params = random_params(cfg, seed=0)
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

    precise = IndexTTS2Engine(cfg, params, precise_shapes=True)
    bucketed = IndexTTS2Engine(cfg, params, precise_shapes=False)
    # deterministic-length decode (ban the stop token) so the compared body
    # is guaranteed non-trivial after the receptive-field margin
    for e in (precise, bucketed):
        e.decoder = GPTDecoder(
            e.gpt, cfg.gpt,
            SamplingConfig(do_sample=True, top_k=30, ban_stop_token=True),
        )
    sr = 16000
    prompt = (rng.standard_normal(sr) * 0.1).astype(np.float32)
    text = rng.integers(2, 50, 7)
    out_p = precise.infer((prompt, sr), [text], seed=5, num_beams=1)
    out_b = bucketed.infer((prompt, sr), [text], seed=5, num_beams=1)
    # identical decode -> identical trimmed length
    assert out_p["stats"][0].codes_len == out_b["stats"][0].codes_len
    wav_p, wav_b = out_p["audio"], out_b["audio"]
    assert len(wav_p) == len(wav_b)
    # the vocoder's receptive field at the segment tail sees bucket padding
    # (log(1e-5) silence) instead of the exact buffer edge; everything before
    # that margin must agree to float tolerance. The tiny vocoder's RF is
    # ~5 mel frames (measured: diffs start ~2.5 frames from the end), so a
    # 10-frame margin leaves a non-empty compared body even for the short
    # outputs this config produces (a 40-frame margin silently compared
    # nothing).
    margin = 10 * cfg.vocoder.total_upsample
    body_p, body_b = wav_p[:-margin], wav_b[:-margin]
    assert len(body_b) > 2000, "test must compare a non-trivial body"
    np.testing.assert_allclose(body_b, body_p, atol=5e-4, rtol=1e-3)
    assert np.isfinite(wav_b).all()


def test_train_step_reduces_loss():
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.train import make_train_step

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
    model = UnifiedVoice(cfg)
    B, Lt, Lm = 2, 6, 10
    rngs = np.random.default_rng(0)
    batch = {
        "spk_latents": jnp.asarray(rngs.standard_normal((B, 32, 64)), jnp.float32),
        "text_ids": jnp.asarray(rngs.integers(2, 50, (B, Lt)), jnp.int32),
        "text_lens": jnp.full((B,), Lt),
        "mel_codes": jnp.asarray(rngs.integers(0, 34, (B, Lm)), jnp.int32),
        "mel_lens": jnp.full((B,), Lm),
        "emovec": jnp.asarray(rngs.standard_normal((B, 64)), jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        batch["spk_latents"], batch["text_ids"], batch["text_lens"],
        batch["mel_codes"], batch["mel_lens"], batch["emovec"],
        method=UnifiedVoice.forward_train,
    )
    opt = optax.adam(1e-3)
    step = jax.jit(make_train_step(model, opt))
    opt_state = opt.init(params)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
