"""Golden parity tests: our flax UnifiedVoice vs the reference PyTorch
implementation (random weights, tiny config), through the real weight
converter. This validates both the model math and the converter."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import import_reference  # noqa: E402

from indextts_tpu.config import ConditionModuleConfig, GPTConfig  # noqa: E402
from indextts_tpu.models.unified_voice import UnifiedVoice  # noqa: E402
from indextts_tpu.runtime import torch_convert as tc  # noqa: E402
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig  # noqa: E402

TINY = dict(
    layers=2,
    model_dim=64,
    heads=4,
    max_text_tokens=40,
    max_mel_tokens=60,
    number_text_tokens=50,
    number_mel_codes=66,
    start_mel_token=64,
    stop_mel_token=65,
    start_text_token=0,
    stop_text_token=1,
    condition_type="conformer_perceiver",
    condition_module=dict(
        output_size=32,
        linear_units=48,
        attention_heads=4,
        num_blocks=2,
        input_layer="conv2d2",
        perceiver_mult=2,
    ),
    emo_condition_module=dict(
        output_size=32,
        linear_units=32,
        attention_heads=2,
        num_blocks=1,
        input_layer="conv2d2",
        perceiver_mult=2,
    ),
)


@pytest.fixture(scope="module")
def ref_and_ours():
    torch.manual_seed(0)
    mv2 = import_reference("indextts.gpt.model_v2")
    ref = mv2.UnifiedVoice(
        **{k: v for k, v in TINY.items() if k not in ()},
        use_accel=False,
    )
    ref.eval()

    cfg = GPTConfig(
        model_dim=TINY["model_dim"],
        layers=TINY["layers"],
        heads=TINY["heads"],
        max_mel_tokens=TINY["max_mel_tokens"],
        max_text_tokens=TINY["max_text_tokens"],
        number_text_tokens=TINY["number_text_tokens"],
        number_mel_codes=TINY["number_mel_codes"],
        start_mel_token=TINY["start_mel_token"],
        stop_mel_token=TINY["stop_mel_token"],
        condition_module=ConditionModuleConfig(**TINY["condition_module"]),
        emo_condition_module=ConditionModuleConfig(**TINY["emo_condition_module"]),
    )
    model = UnifiedVoice(cfg)
    sd = tc.to_numpy_sd(ref.state_dict())
    params = {"params": tc.convert_unified_voice(sd, cfg)}
    return ref, model, params, cfg


def test_param_tree_matches_init(ref_and_ours):
    _, model, params, cfg = ref_and_ours
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 1024), jnp.float32),
        jnp.asarray([32]),
        method=UnifiedVoice.get_conditioning,
    )
    # the converted tree must contain every leaf the init tree has, same shapes
    flat_init = jax.tree_util.tree_flatten_with_path(init["params"])[0]
    flat_conv = dict(jax.tree_util.tree_flatten_with_path(params["params"])[0])
    missing = []
    for path, leaf in flat_init:
        if path not in flat_conv:
            missing.append(jax.tree_util.keystr(path))
        elif flat_conv[path].shape != leaf.shape:
            missing.append(
                f"{jax.tree_util.keystr(path)}: {flat_conv[path].shape} vs {leaf.shape}"
            )
    # init via get_conditioning only touches the speaker-conditioning branch;
    # every touched leaf must match
    assert not missing, missing


def test_get_conditioning_parity(ref_and_ours, rng):
    ref, model, params, cfg = ref_and_ours
    x = rng.standard_normal((2, 37, 1024)).astype(np.float32)
    lens = np.array([37, 29], dtype=np.int64)
    with torch.no_grad():
        # reference takes (B, 1024, T) and transposes internally
        want = ref.get_conditioning(
            torch.from_numpy(x).transpose(1, 2), torch.from_numpy(lens)
        ).numpy()
    got = np.asarray(
        model.apply(
            params, jnp.asarray(x), jnp.asarray(lens), method=UnifiedVoice.get_conditioning
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_get_emovec_parity(ref_and_ours, rng):
    ref, model, params, cfg = ref_and_ours
    x = rng.standard_normal((1, 33, 1024)).astype(np.float32)
    lens = np.array([33], dtype=np.int64)
    with torch.no_grad():
        want = ref.get_emovec(torch.from_numpy(x), torch.from_numpy(lens)).numpy()
    got = np.asarray(
        model.apply(
            params, jnp.asarray(x), jnp.asarray(lens), method=UnifiedVoice.get_emovec
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_forward_latent_parity(ref_and_ours, rng):
    ref, model, params, cfg = ref_and_ours
    B, Lt, Lm = 1, 9, 13
    spk = rng.standard_normal((B, 21, 1024)).astype(np.float32)
    emo = rng.standard_normal((B, 17, 1024)).astype(np.float32)
    text = rng.integers(2, 50, (B, Lt)).astype(np.int64)
    codes = rng.integers(0, 64, (B, Lm)).astype(np.int64)

    with torch.no_grad():
        spk_lat = ref.get_conditioning(
            torch.from_numpy(spk).transpose(1, 2), torch.tensor([21])
        )
        emovec_t = ref.get_emovec(torch.from_numpy(emo), torch.tensor([17]))
        want = ref(
            spk_lat,
            torch.from_numpy(text),
            torch.tensor([Lt]),
            torch.from_numpy(codes),
            torch.tensor([Lm]),
            None,
            emo_vec=emovec_t,
            use_speed=torch.zeros(B).long(),
        ).numpy()

    spk_lat_j = model.apply(
        params, jnp.asarray(spk), jnp.asarray([21]), method=UnifiedVoice.get_conditioning
    )
    emovec_j = model.apply(
        params, jnp.asarray(emo), jnp.asarray([17]), method=UnifiedVoice.get_emovec
    )
    got = np.asarray(
        model.apply(
            params,
            spk_lat_j,
            jnp.asarray(text, jnp.int32),
            jnp.asarray([Lt]),
            jnp.asarray(codes, jnp.int32),
            jnp.asarray([Lm]),
            emovec_j,
            method=UnifiedVoice.forward_latent,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_greedy_decode_parity(ref_and_ours, rng):
    """Seeded greedy decode: token-for-token match vs the reference HF
    generate() path (SURVEY.md §7.2 step 4 minimum-slice checkpoint)."""
    ref, model, params, cfg = ref_and_ours
    ref.post_init_gpt2_config(use_deepspeed=False, kv_cache=True, half=False)

    B, Lt = 1, 7
    spk = rng.standard_normal((B, 25, 1024)).astype(np.float32)
    emo = rng.standard_normal((B, 19, 1024)).astype(np.float32)
    text = rng.integers(2, 50, (B, Lt)).astype(np.int64)
    max_new = 24

    with torch.no_grad():
        emovec_t = ref.get_emovec(torch.from_numpy(emo), torch.tensor([19]))
        # inference_speech takes (b, frames, d) — it transposes internally
        # before get_conditioning (model_v2.py:819-820)
        want_codes, _ = ref.inference_speech(
            torch.from_numpy(spk),
            torch.from_numpy(text),
            cond_lengths=torch.tensor([25]),
            emo_vec=emovec_t,
            do_sample=False,
            num_beams=1,
            max_generate_length=max_new,
        )
    want = want_codes.numpy()[0]

    spk_lat = model.apply(
        params, jnp.asarray(spk), jnp.asarray([25]), method=UnifiedVoice.get_conditioning
    )
    emovec_j = model.apply(
        params, jnp.asarray(emo), jnp.asarray([19]), method=UnifiedVoice.get_emovec
    )
    conds = model.apply(
        params, spk_lat, emovec_j, method=UnifiedVoice.build_conds_latent
    )

    dec = GPTDecoder(
        model, cfg, SamplingConfig(do_sample=False, use_repetition_penalty=False)
    )
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([Lt]), bucket=Lt)
    res = dec.generate(
        params,
        conds,
        jnp.asarray(ids),
        jnp.asarray(pos),
        jnp.asarray(valid),
        jax.random.PRNGKey(0),
        max_new=max_new,
    )
    got = np.asarray(res.codes)[0]
    n = int(np.asarray(res.lengths)[0])
    # compare up to the reference's own length
    assert want.shape[0] <= max_new
    np.testing.assert_array_equal(got[: want.shape[0]], want)


def test_beam_search_parity(ref_and_ours, rng):
    """num_beams=3 greedy beam search vs the reference HF beam_search."""
    ref, model, params, cfg = ref_and_ours
    if not hasattr(ref, "inference_model"):
        ref.post_init_gpt2_config(use_deepspeed=False, kv_cache=True, half=False)

    B, Lt = 1, 6
    spk = rng.standard_normal((B, 23, 1024)).astype(np.float32)
    emo = rng.standard_normal((B, 21, 1024)).astype(np.float32)
    text = rng.integers(2, 50, (B, Lt)).astype(np.int64)
    max_new = 16

    with torch.no_grad():
        emovec_t = ref.get_emovec(torch.from_numpy(emo), torch.tensor([21]))
        want_codes, _ = ref.inference_speech(
            torch.from_numpy(spk),
            torch.from_numpy(text),
            cond_lengths=torch.tensor([23]),
            emo_vec=emovec_t,
            do_sample=False,
            num_beams=3,
            repetition_penalty=10.0,
            length_penalty=0.0,
            max_generate_length=max_new,
        )
    want = want_codes.numpy()[0]

    spk_lat = model.apply(
        params, jnp.asarray(spk), jnp.asarray([23]), method=UnifiedVoice.get_conditioning
    )
    emovec_j = model.apply(
        params, jnp.asarray(emo), jnp.asarray([21]), method=UnifiedVoice.get_emovec
    )
    conds = model.apply(
        params, spk_lat, emovec_j, method=UnifiedVoice.build_conds_latent
    )
    dec = GPTDecoder(
        model, cfg, SamplingConfig(do_sample=False, use_repetition_penalty=True)
    )
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.array([Lt]), bucket=Lt)
    res = dec.generate_beam(
        params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        max_new=max_new, num_beams=3, repetition_penalty=10.0, length_penalty=0.0,
    )
    got = np.asarray(res.codes)[0]
    np.testing.assert_array_equal(got[: want.shape[0]], want)


def test_typical_filter_matches_reference(rng):
    """typical_filter vs the reference TypicalLogitsWarper (same mask)."""
    from indextts_tpu.runtime.decode import typical_filter
    tw_mod = import_reference("indextts.utils.typical_sampling")
    warper = tw_mod.TypicalLogitsWarper(mass=0.9)
    scores = rng.standard_normal((3, 40)).astype(np.float32) * 2.0
    with torch.no_grad():
        want = warper(None, torch.from_numpy(scores.copy())).numpy()
    got = np.asarray(typical_filter(jnp.asarray(scores), 0.9))
    np.testing.assert_array_equal(np.isneginf(want), got <= -1e8)
    kept = ~np.isneginf(want)
    np.testing.assert_allclose(got[kept], want[kept], atol=1e-6)
