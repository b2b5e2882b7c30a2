"""Decode-loop invariants (the reference's padding_test.py analog):
greedy tokens must be independent of the text padding bucket and of batch
packing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.models.unified_voice import UnifiedVoice
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

TINY = GPTConfig(
    model_dim=64, layers=2, heads=4, max_mel_tokens=64, max_text_tokens=48,
    number_text_tokens=50, number_mel_codes=36, start_mel_token=34,
    stop_mel_token=35,
    condition_module=ConditionModuleConfig(
        output_size=32, linear_units=48, attention_heads=4, num_blocks=1
    ),
    emo_condition_module=ConditionModuleConfig(
        output_size=32, linear_units=32, attention_heads=2, num_blocks=1
    ),
)


@pytest.fixture(scope="module")
def setup():
    model = UnifiedVoice(TINY)
    rngk = jax.random.PRNGKey(0)
    p = model.init(
        rngk,
        jnp.zeros((1, 32, 64)), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]), jnp.zeros((1, 64)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = model.init(
        rngk, jnp.zeros((1, 64)), method=UnifiedVoice.mel_logits_from_hidden
    )["params"]
    for k, v in ph.items():
        p.setdefault(k, v)
    dec = GPTDecoder(model, TINY, SamplingConfig(do_sample=False, use_repetition_penalty=False))
    rng = np.random.default_rng(5)
    conds = jnp.asarray(rng.standard_normal((1, 34, 64)), jnp.float32)
    text = rng.integers(2, 50, (1, 9))
    return dec, {"params": p}, conds, text


def _run(dec, params, conds, text, bucket, max_new=14):
    ids, pos, valid = dec.build_text_prompt_arrays(
        text, np.array([text.shape[1]]), bucket
    )
    res = dec.generate(
        params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        jax.random.PRNGKey(0), max_new=max_new,
    )
    return np.asarray(res.codes)[0]


def test_padding_bucket_invariance(setup):
    """Greedy tokens identical with text padded to different bucket sizes
    (left-pad masking must be logit-neutral; reference padding_test.py)."""
    dec, params, conds, text = setup
    a = _run(dec, params, conds, text, bucket=9)
    b = _run(dec, params, conds, text, bucket=16)
    c = _run(dec, params, conds, text, bucket=32)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_batch_packing_invariance(setup):
    """A sequence decodes to the same greedy tokens alone or packed in a
    batch with a different-length sequence."""
    dec, params, conds, text = setup
    solo = _run(dec, params, conds, text, bucket=12)

    rng = np.random.default_rng(7)
    other = rng.integers(2, 50, 5)
    B_text = np.zeros((2, 9), np.int64)
    B_text[0] = text[0]
    B_text[1, :5] = other
    ids, pos, valid = dec.build_text_prompt_arrays(B_text, np.array([9, 5]), 12)
    conds2 = jnp.concatenate([conds, conds], axis=0)
    res = dec.generate(
        params, conds2, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        jax.random.PRNGKey(0), max_new=14,
    )
    packed = np.asarray(res.codes)[0]
    np.testing.assert_array_equal(solo, packed)


def test_stop_token_stops_early(setup):
    """Sequences that emit stop are padded with stop and length reflects it."""
    dec, params, conds, text = setup
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([9]), 9)
    res = dec.generate(
        params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        jax.random.PRNGKey(0), max_new=30,
    )
    codes = np.asarray(res.codes)[0]
    n = int(np.asarray(res.lengths)[0])
    if n < 30:
        assert codes[n - 1] == TINY.stop_mel_token
        assert (codes[n:] == TINY.stop_mel_token).all()


def test_remove_long_silence_matches_reference():
    """Our host-side remove_long_silence equals the reference's
    (infer_v2.py:410-465 == infer.py:147; live in v1 at infer.py:450,639)."""
    import torch
    from tests import reference_compat as rc

    infer_v2 = rc.import_reference("indextts.infer_v2")

    class Shim:
        stop_mel_token = 8193

    ref_fn = infer_v2.IndexTTS2.remove_long_silence.__get__(Shim())
    from indextts_tpu.runtime.engine import IndexTTS2Engine

    rng = np.random.default_rng(3)
    cases = []
    # long silence run mid-sequence, then stop
    c = rng.integers(0, 100, 120)
    c[20:70] = 52
    c[100] = 8193
    cases.append(c)
    # scattered silences below the threshold
    c = rng.integers(0, 100, 60)
    c[::7] = 52
    cases.append(c)
    # no stop token at all, heavy silence
    c = np.full(80, 52)
    c[::11] = 3
    cases.append(c)
    for c in cases:
        want_codes, want_lens = ref_fn(torch.from_numpy(c[None].astype(np.int64)))
        got, got_len = IndexTTS2Engine.remove_long_silence(
            c.astype(np.int32), stop_token=8193
        )
        assert got_len == int(want_lens[0])
        np.testing.assert_array_equal(got, want_codes[0, :got_len].numpy())


def test_beam_sample_modes(setup):
    """Beam-multinomial sampling (the reference's default serving config):
    reproducible per key, different across keys, and distinct from the
    deterministic beam; deterministic beam ignores the key entirely."""
    dec, params, conds, text = setup
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([text.shape[1]]), 12)
    args = (params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid))

    det1 = dec.generate_beam(*args, max_new=14, num_beams=3)
    det2 = dec.generate_beam(*args, max_new=14, num_beams=3,
                             key=jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(det1.codes), np.asarray(det2.codes))

    bs1 = dec.generate_beam(*args, max_new=14, num_beams=3, do_sample=True,
                            key=jax.random.PRNGKey(1), temperature=0.8, top_p=0.8)
    bs1b = dec.generate_beam(*args, max_new=14, num_beams=3, do_sample=True,
                             key=jax.random.PRNGKey(1), temperature=0.8, top_p=0.8)
    np.testing.assert_array_equal(np.asarray(bs1.codes), np.asarray(bs1b.codes))
    assert np.asarray(bs1.lengths)[0] >= 1

    # random tiny weights finalize on an immediate stop (length_penalty=0
    # favors the shortest hypothesis) — ban stop so the walk is visible
    dec_ban = GPTDecoder(
        dec.model, TINY,
        SamplingConfig(do_sample=False, use_repetition_penalty=False,
                       ban_stop_token=True),
    )
    runs = []
    for sd in range(2, 6):
        bs = dec_ban.generate_beam(*args, max_new=14, num_beams=3,
                                   do_sample=True, key=jax.random.PRNGKey(sd),
                                   temperature=0.8, top_p=0.8)
        runs.append(np.asarray(bs.codes))
    diffs = sum(1 for r in runs[1:] if not np.array_equal(r, runs[0]))
    assert diffs > 0, "beam sampling produced identical codes for every key"


def test_beam_sample_matches_deterministic_at_low_temperature(setup):
    """As temperature -> 0 the beam-sample candidate draw concentrates on the
    top-2nb set, but scores stay temperature-scaled; instead verify the
    degenerate case top_p->0: only the per-beam argmax survives the warper,
    so every candidate equals a deterministic single-token continuation."""
    dec, params, conds, text = setup
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([text.shape[1]]), 12)
    args = (params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid))
    a = dec.generate_beam(*args, max_new=10, num_beams=2, do_sample=True,
                          key=jax.random.PRNGKey(0), temperature=1e-4, top_p=1e-6)
    b = dec.generate_beam(*args, max_new=10, num_beams=2, do_sample=True,
                          key=jax.random.PRNGKey(9), temperature=1e-4, top_p=1e-6)
    np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(b.codes))
