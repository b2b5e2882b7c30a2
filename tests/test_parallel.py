"""Multi-device tests on the 8-device virtual CPU mesh: TP-sharded inference
matches unsharded results; the sharded training step runs (SURVEY §4
'fake-mesh' plan)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.models.unified_voice import UnifiedVoice
from indextts_tpu.parallel.sharding import (
    GPT_PARTITION_RULES,
    make_mesh,
    shard_params,
)

TINY = GPTConfig(
    model_dim=64,
    layers=2,
    heads=4,
    max_mel_tokens=64,
    max_text_tokens=32,
    number_text_tokens=64,
    number_mel_codes=40,
    start_mel_token=38,
    stop_mel_token=39,
    condition_module=ConditionModuleConfig(
        output_size=32, linear_units=64, attention_heads=4, num_blocks=1
    ),
    emo_condition_module=ConditionModuleConfig(
        output_size=32, linear_units=32, attention_heads=2, num_blocks=1
    ),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = UnifiedVoice(TINY)
    B, Lt, Lm = 2, 8, 12
    args = (
        jnp.zeros((B, TINY.condition_num_latent, TINY.model_dim)),
        jnp.zeros((B, Lt), jnp.int32),
        jnp.full((B,), Lt),
        jnp.zeros((B, Lm), jnp.int32),
        jnp.full((B,), Lm),
        jnp.zeros((B, TINY.model_dim)),
    )
    params = model.init(
        jax.random.PRNGKey(0), *args, method=UnifiedVoice.forward_latent
    )
    return model, params


def test_device_count():
    assert jax.device_count() >= 8, "conftest must force an 8-device CPU mesh"


def test_tp_inference_matches_unsharded(model_and_params, rng):
    model, params = model_and_params
    B, Lt, Lm = 2, 8, 12
    spk = jnp.asarray(rng.standard_normal((B, 32, TINY.model_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(2, 60, (B, Lt)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 38, (B, Lm)), jnp.int32)
    emovec = jnp.asarray(rng.standard_normal((B, TINY.model_dim)), jnp.float32)
    args = (spk, text, jnp.full((B,), Lt), codes, jnp.full((B,), Lm), emovec)

    want = np.asarray(
        model.apply(params, *args, method=UnifiedVoice.forward_latent)
    )

    mesh = make_mesh(2, 4)
    sharded = {"params": shard_params(params["params"], mesh, GPT_PARTITION_RULES)}

    @jax.jit
    def fwd(p, *a):
        return model.apply(p, *a, method=UnifiedVoice.forward_latent)

    batch_sh = NamedSharding(mesh, P("data"))
    args_sh = tuple(jax.device_put(a, batch_sh) for a in args)
    with mesh:
        got = np.asarray(fwd(sharded, *args_sh))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_partition_rules_shard_the_big_matrices(model_and_params):
    model, params = model_and_params
    mesh = make_mesh(1, 4)
    sharded = shard_params(params["params"], mesh, GPT_PARTITION_RULES)
    catn = sharded["gpt"]["h_0"]["attn"]["c_attn"]["kernel"]
    # column sharding over 'model' axis
    spec = catn.sharding.spec
    assert spec == P(None, "model")
    cproj = sharded["gpt"]["h_0"]["attn"]["c_proj"]["kernel"]
    assert cproj.sharding.spec == P("model", None)


def test_dryrun_multichip_entry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dit_tp_inference_matches_unsharded(rng):
    """DiT tensor-parallel sharding (SURVEY §2.7 long-context plan): sharded
    velocity field equals unsharded."""
    from indextts_tpu.config import DiTConfig, LengthRegulatorConfig, S2MelConfig, WaveNetConfig
    from indextts_tpu.models.s2mel import S2Mel
    from indextts_tpu.parallel.sharding import DIT_PARTITION_RULES

    cfg = S2MelConfig(
        length_regulator=LengthRegulatorConfig(channels=16, in_channels=24),
        dit=DiTConfig(hidden_dim=64, num_heads=4, depth=3, in_channels=8,
                      content_dim=24, style_dim=12),
        wavenet=WaveNetConfig(hidden_dim=64, num_layers=2, kernel_size=5),
        gpt_dims=(20, 10, 6, 24),
    )
    model = S2Mel(cfg)
    B, T = 2, 40
    x = jnp.asarray(rng.standard_normal((B, 8, T)), jnp.float32)
    px = jnp.zeros((B, 8, T))
    xl = jnp.full((B,), T)
    t = jnp.asarray([0.3, 0.7])
    st = jnp.asarray(rng.standard_normal((B, 12)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, T, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, px, xl, t, st, c, method=S2Mel.velocity)

    want = np.asarray(model.apply(params, x, px, xl, t, st, c, method=S2Mel.velocity))

    mesh = make_mesh(2, 4)
    sharded = {"params": shard_params(params["params"], mesh, DIT_PARTITION_RULES)}

    @jax.jit
    def fwd(p, *a):
        return model.apply(p, *a, method=S2Mel.velocity)

    bsh = NamedSharding(mesh, P("data"))
    args = tuple(jax.device_put(a, bsh) for a in (x, px, xl, t, st, c))
    with mesh:
        got = np.asarray(fwd(sharded, *args))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_tp_sharded_decode_loop_matches_unsharded(rng):
    """The full jitted AR decode loop (VERDICT r1 weak #3): TP-sharded params
    + SPMD-propagated head-sharded KV cache produce token-identical greedy
    codes vs the unsharded loop."""
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

    model = UnifiedVoice(TINY)
    dec = GPTDecoder(model, TINY, SamplingConfig(do_sample=False))
    B, Lt, max_new = 2, 6, 10
    text = rng.integers(2, 60, (B, Lt))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.full(B, Lt), Lt)
    conds = jnp.asarray(
        rng.standard_normal((B, TINY.condition_num_latent, TINY.model_dim)),
        jnp.float32,
    )
    # init via forward_latent + mel head (same structure the decode loop reads)
    p = model.init(
        jax.random.PRNGKey(0),
        conds,
        jnp.zeros((B, Lt), jnp.int32),
        jnp.full((B,), Lt),
        jnp.zeros((B, 4), jnp.int32),
        jnp.full((B,), 4),
        jnp.zeros((B, TINY.model_dim)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = model.init(
        jax.random.PRNGKey(1), jnp.zeros((B, TINY.model_dim)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k2, v2 in ph.items():
        p.setdefault(k2, v2)
    params = {"params": p}
    key = jax.random.PRNGKey(7)

    res = dec.generate(
        params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        key, max_new=max_new,
    )
    want_codes = np.asarray(res.codes)
    want_lengths = np.asarray(res.lengths)

    mesh = make_mesh(2, 2)  # data=2 x model=2; 4 heads % 2 == 0
    # non-strict: the tiny 65-row text embedding replicates (odd vocab);
    # flagship-dim strictness is covered by dryrun_multichip
    sharded = {
        "params": shard_params(params["params"], mesh, GPT_PARTITION_RULES)
    }
    bsh = NamedSharding(mesh, P("data"))
    with mesh:
        res_sh = dec.generate(
            sharded,
            jax.device_put(conds, bsh),
            jax.device_put(jnp.asarray(ids), bsh),
            jax.device_put(jnp.asarray(pos), bsh),
            jax.device_put(jnp.asarray(valid), bsh),
            key,
            max_new=max_new,
        )
        got_codes = np.asarray(res_sh.codes)
        got_lengths = np.asarray(res_sh.lengths)

    np.testing.assert_array_equal(got_codes, want_codes)
    np.testing.assert_array_equal(got_lengths, want_lengths)


def test_tp_sharded_decode_loop_quantized(rng):
    """W8A8 TP decode: int8 kernel_q/kernel_scale partition rules produce
    token-identical greedy codes vs the unsharded quantized loop (int32
    partial sums psum exactly; scales apply after the reduction)."""
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
    from indextts_tpu.runtime.torch_convert import quantize_gpt_tree

    model = UnifiedVoice(TINY, quantize_gpt=True)
    dec = GPTDecoder(model, TINY, SamplingConfig(do_sample=False))
    B, Lt, max_new = 2, 6, 10
    text = rng.integers(2, 60, (B, Lt))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.full(B, Lt), Lt)
    conds = jnp.asarray(
        rng.standard_normal((B, TINY.condition_num_latent, TINY.model_dim)),
        jnp.float32,
    )
    fp = UnifiedVoice(TINY)
    p = fp.init(
        jax.random.PRNGKey(0),
        conds,
        jnp.zeros((B, Lt), jnp.int32),
        jnp.full((B,), Lt),
        jnp.zeros((B, 4), jnp.int32),
        jnp.full((B,), 4),
        jnp.zeros((B, TINY.model_dim)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = fp.init(
        jax.random.PRNGKey(1), jnp.zeros((B, TINY.model_dim)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k2, v2 in ph.items():
        p.setdefault(k2, v2)
    params = {"params": quantize_gpt_tree(p)}
    key = jax.random.PRNGKey(7)

    res = dec.generate(
        params, conds, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
        key, max_new=max_new,
    )
    want_codes = np.asarray(res.codes)

    mesh = make_mesh(2, 2)
    sharded = {
        "params": shard_params(params["params"], mesh, GPT_PARTITION_RULES)
    }
    bsh = NamedSharding(mesh, P("data"))
    with mesh:
        res_sh = dec.generate(
            sharded,
            jax.device_put(conds, bsh),
            jax.device_put(jnp.asarray(ids), bsh),
            jax.device_put(jnp.asarray(pos), bsh),
            jax.device_put(jnp.asarray(valid), bsh),
            key,
            max_new=max_new,
        )
        got_codes = np.asarray(res_sh.codes)
    np.testing.assert_array_equal(got_codes, want_codes)


def test_multihost_noop_single_process(monkeypatch):
    """maybe_initialize_distributed: strict no-op without topology envs and
    with an explicit single-process topology."""
    from indextts_tpu.parallel import multihost

    for k in ("TARS_COORDINATOR", "JAX_COORDINATOR_ADDRESS",
              "TARS_NUM_PROCESSES", "JAX_NUM_PROCESSES"):
        monkeypatch.delenv(k, raising=False)
    assert multihost.maybe_initialize_distributed() is False
    monkeypatch.setenv("TARS_NUM_PROCESSES", "1")
    assert multihost.maybe_initialize_distributed() is False


def test_multihost_global_mesh_layout():
    """global_mesh puts TP inside the local (ICI) domain: with 8 local
    devices and model=2 the mesh is (data=4, model=2)."""
    from indextts_tpu.parallel.multihost import global_mesh

    mesh = global_mesh(model=2)
    assert mesh.devices.shape == (len(jax.devices()) // 2, 2)
    assert mesh.axis_names == ("data", "model")
