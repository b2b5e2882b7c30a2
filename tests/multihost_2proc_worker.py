"""Worker for tests/test_multihost_2proc.py — one of two real OS processes.

Run as:  python multihost_2proc_worker.py <process_id> <coordinator host:port>

Exercises `parallel/multihost.py` in its target mode (the reference's only
multi-process analog is the dataset pipeline's process backend,
/root/reference/tools/build_moshi_dataset_with_indexts.py:323-414):

  1. `maybe_initialize_distributed()` via the TARS_* env contract against a
     localhost coordinator on the CPU backend (2 processes x 2 local
     devices = 4 global devices),
  2. a shard_map psum over the cross-process `data` axis,
  3. a DP-split batched greedy decode over the global (4,1) mesh, asserted
     token-identical to the single-process unsharded loop,
  4. (VERDICT r4 #7) the FULL DP-sharded inference cascade — decode ->
     GPT latent -> regulator -> CFM(2 steps) -> vocoder — over the same
     2-process mesh, waveform-allclose vs the process-local unsharded
     cascade (the composition of the dryrun's SPMD proof with the real
     distributed runtime; reference cascade: infer_v2.py:830-860).

Prints WORKER_OK on success; any assertion kills the process (parent checks
exit codes)."""

import os
import sys


def main() -> None:
    pid, coord = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["TARS_COORDINATOR"] = coord
    os.environ["TARS_NUM_PROCESSES"] = "2"
    os.environ["TARS_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from indextts_tpu.parallel import multihost

    assert multihost.maybe_initialize_distributed() is True
    assert jax.process_count() == 2 and jax.process_index() == pid
    assert jax.local_device_count() == 2 and jax.device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = multihost.global_mesh(model=1)
    assert mesh.devices.shape == (4, 1)

    # --- (a) psum across processes -------------------------------------
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    local = np.full((2, 3), float(pid + 1), np.float32)  # 2 local rows/proc
    g = jax.make_array_from_process_local_data(data_sh, local)
    summed = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(x, "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
        ),
        out_shardings=repl,
    )(g)
    # rows are (1,1,2,2) over the data axis -> psum = 1+1+2+2 = 6 per element
    np.testing.assert_allclose(np.asarray(summed), np.full((1, 3), 6.0))

    # --- (b) DP-split batched decode == single-process decode ----------
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

    cfg = GPTConfig(
        model_dim=64, layers=2, heads=4, max_mel_tokens=64, max_text_tokens=32,
        number_text_tokens=64, number_mel_codes=40, start_mel_token=38,
        stop_mel_token=39,
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=64, attention_heads=4, num_blocks=1
        ),
        emo_condition_module=ConditionModuleConfig(
            output_size=32, linear_units=32, attention_heads=2, num_blocks=1
        ),
    )
    model = UnifiedVoice(cfg)
    dec = GPTDecoder(model, cfg, SamplingConfig(do_sample=False))
    B, Lt, max_new = 4, 6, 8
    rng = np.random.default_rng(42)  # same stream in both processes
    text = rng.integers(2, 60, (B, Lt))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.full(B, Lt), Lt)
    conds = rng.standard_normal(
        (B, cfg.condition_num_latent, cfg.model_dim)
    ).astype(np.float32)

    p = model.init(
        jax.random.PRNGKey(0), jnp.asarray(conds), jnp.zeros((B, Lt), jnp.int32),
        jnp.full((B,), Lt), jnp.zeros((B, 4), jnp.int32), jnp.full((B,), 4),
        jnp.zeros((B, cfg.model_dim)), method=UnifiedVoice.forward_latent,
    )["params"]
    ph = model.init(
        jax.random.PRNGKey(1), jnp.zeros((B, cfg.model_dim)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k, v in ph.items():
        p.setdefault(k, v)
    key = jax.random.PRNGKey(7)

    # reference: unsharded, process-local run (identical in both processes)
    res = dec.generate(
        {"params": p}, jnp.asarray(conds), jnp.asarray(ids),
        jnp.asarray(pos), jnp.asarray(valid), key, max_new=max_new,
    )
    want_codes = np.asarray(res.codes)
    want_lengths = np.asarray(res.lengths)

    # DP over the global mesh: this process contributes rows [2*pid, 2*pid+2)
    params_g = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        {"params": p},
    )
    lo = 2 * pid
    def split(a):
        return jax.make_array_from_process_local_data(
            data_sh, np.asarray(a)[lo:lo + 2]
        )

    with mesh:
        res_sh = dec.generate(
            params_g, split(conds), split(ids), split(pos), split(valid),
            jax.make_array_from_process_local_data(repl, np.asarray(key)),
            max_new=max_new,
        )
        # replicate outputs so every process can read the full batch
        gather = jax.jit(lambda a: a, out_shardings=repl)
        got_codes = np.asarray(gather(res_sh.codes))
        got_lengths = np.asarray(gather(res_sh.lengths))

    np.testing.assert_array_equal(got_codes, want_codes)
    np.testing.assert_array_equal(got_lengths, want_lengths)

    # --- (c) full DP-sharded cascade == unsharded cascade ---------------
    _cascade_stage(mesh, pid, repl, data_sh)
    print(f"WORKER_OK pid={pid} codes={got_codes.shape}", flush=True)


def _cascade_stage(mesh, pid, repl, data_sh) -> None:
    """Decode -> latent -> regulator -> CFM(2) -> vocoder across the
    2-process (4,1) mesh, waveform-allclose vs the local unsharded run
    (both processes hold identical weights/batches from seeded host rng)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from indextts_tpu.models.repcodec import RepCodec
    from indextts_tpu.models.s2mel import S2Mel
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
    from indextts_tpu.runtime.engine import random_params
    from indextts_tpu.runtime.s2mel_infer import cfm_inference
    from indextts_tpu.models.bigvgan import BigVGAN
    from indextts_tpu.config import (
        BigVGANConfig, ConditionModuleConfig, DiTConfig, GPTConfig,
        IndexTTS2Config, LengthRegulatorConfig, RuntimeConfig, S2MelConfig,
        SemanticCodecConfig, W2VBertConfig, WaveNetConfig,
    )

    cfg = IndexTTS2Config(
        gpt=GPTConfig(
            model_dim=64, layers=2, heads=4, max_mel_tokens=64,
            max_text_tokens=32, number_text_tokens=50, number_mel_codes=36,
            start_mel_token=34, stop_mel_token=35,
            condition_module=ConditionModuleConfig(
                output_size=32, linear_units=48, attention_heads=4,
                num_blocks=1,
            ),
            emo_condition_module=ConditionModuleConfig(
                output_size=32, linear_units=32, attention_heads=2,
                num_blocks=1,
            ),
        ),
        semantic_codec=SemanticCodecConfig(
            codebook_size=36, hidden_size=1024, codebook_dim=8, vocos_dim=24,
            vocos_intermediate_dim=32, vocos_num_layers=1,
        ),
        s2mel=S2MelConfig(
            length_regulator=LengthRegulatorConfig(channels=32, in_channels=1024),
            dit=DiTConfig(hidden_dim=32, num_heads=4, depth=2, in_channels=80,
                          content_dim=32, style_dim=192),
            wavenet=WaveNetConfig(hidden_dim=32, num_layers=2, kernel_size=5),
            gpt_dims=(64, 16, 8, 1024),
        ),
        vocoder=BigVGANConfig(
            num_mels=80, upsample_rates=(8, 8, 4),
            upsample_kernel_sizes=(16, 16, 8), upsample_initial_channel=16,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        ),
        w2vbert=W2VBertConfig(
            hidden_size=1024, num_hidden_layers=1, num_attention_heads=4,
            intermediate_size=64, tap_layer=1, conv_depthwise_kernel_size=7,
        ),
        runtime=RuntimeConfig(diffusion_steps=2, max_mel_tokens=16),
    )
    params = random_params(cfg, seed=0)  # seeded host fill: identical/process
    gpt = UnifiedVoice(cfg.gpt)
    s2mel = S2Mel(cfg.s2mel)
    repcodec = RepCodec(cfg.semantic_codec)
    bigvgan = BigVGAN(cfg.vocoder)
    dec = GPTDecoder(gpt, cfg.gpt, SamplingConfig(do_sample=False))

    B, Lt, max_new = 4, 6, 8
    rng = np.random.default_rng(5)
    text = rng.integers(2, 48, (B, Lt))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.full(B, Lt), Lt)
    conds = rng.standard_normal(
        (B, cfg.gpt.condition_num_latent, cfg.gpt.model_dim)
    ).astype(np.float32)
    ref_len, target_len = 12, int(np.floor(max_new * 1.72))
    total_len = ref_len + target_len
    prompt_condition = rng.standard_normal(
        (B, ref_len, cfg.s2mel.length_regulator.channels)
    ).astype(np.float32)
    ref_mel = rng.standard_normal((B, 80, ref_len)).astype(np.float32)
    style = rng.standard_normal((B, 192)).astype(np.float32)
    noise = rng.standard_normal((B, 80, total_len)).astype(np.float32)
    emovec = np.zeros((B, cfg.gpt.model_dim), np.float32)
    key = jax.random.PRNGKey(11)

    def post_decode(pg, ps, pr, pb, codes, code_len, conds_x, text_x, lens_x,
                    emovec_x, prompt_cond_x, ref_mel_x, style_x, noise_x):
        """Mirrors engine._finish_from_codes / _s2mel_mel
        (reference: infer_v2.py:830-860)."""
        latent = gpt.apply(
            pg, conds_x, text_x, lens_x, codes, code_len, emovec_x,
            method=UnifiedVoice.forward_latent,
        )
        lat = s2mel.apply(ps, latent, method=S2Mel.project_gpt_latent)
        s_infer = repcodec.apply(pr, codes, method=RepCodec.vq2emb) + lat
        target_lengths = jnp.floor(
            code_len.astype(jnp.float32) * 1.72
        ).astype(jnp.int32)
        cond = s2mel.apply(
            ps, s_infer, target_lengths, target_len, code_len,
            method=S2Mel.regulate,
        )
        cat_cond = jnp.concatenate([prompt_cond_x, cond], axis=1)
        x_lens = jnp.full((codes.shape[0],), ref_len) + target_lengths
        prompt_x = jnp.zeros((codes.shape[0], 80, total_len))
        prompt_x = jax.lax.dynamic_update_slice(prompt_x, ref_mel_x, (0, 0, 0))
        vc = cfm_inference(
            s2mel, ps, cat_cond, x_lens, prompt_x,
            jnp.asarray(ref_len), style_x, noise_x,
            n_steps=2, cfg_rate=0.7,
        )
        return bigvgan.apply(pb, vc)

    # unsharded local reference (identical in both processes)
    res = dec.generate(
        {"params": params["gpt"]}, jnp.asarray(conds), jnp.asarray(ids),
        jnp.asarray(pos), jnp.asarray(valid), key, max_new=max_new,
    )
    want_codes = np.asarray(res.codes)
    wav_ref = np.asarray(jax.jit(post_decode)(
        {"params": params["gpt"]}, {"params": params["s2mel"]},
        {"params": params["repcodec"]}, {"params": params["bigvgan"]},
        res.codes, res.lengths, jnp.asarray(conds), jnp.asarray(text),
        jnp.full((B,), Lt), jnp.asarray(emovec), jnp.asarray(prompt_condition),
        jnp.asarray(ref_mel), jnp.asarray(style), jnp.asarray(noise),
    ))

    # DP-sharded across the two processes: params replicated, batch split
    def g_repl(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)
            ),
            tree,
        )

    lo = 2 * pid

    def split(a):
        return jax.make_array_from_process_local_data(
            data_sh, np.asarray(a)[lo:lo + 2]
        )

    pg = g_repl({"params": params["gpt"]})
    ps = g_repl({"params": params["s2mel"]})
    pr = g_repl({"params": params["repcodec"]})
    pb = g_repl({"params": params["bigvgan"]})
    with mesh:
        res_sh = dec.generate(
            pg, split(conds), split(ids), split(pos), split(valid),
            jax.make_array_from_process_local_data(repl, np.asarray(key)),
            max_new=max_new,
        )
        wav_sh_g = jax.jit(post_decode)(
            pg, ps, pr, pb, res_sh.codes, res_sh.lengths,
            split(conds), split(text), split(np.full((B,), Lt)),
            split(emovec), split(prompt_condition), split(ref_mel),
            split(style), split(noise),
        )
        gather = jax.jit(lambda a: a, out_shardings=repl)
        codes_sh = np.asarray(gather(res_sh.codes))
        wav_sh = np.asarray(gather(wav_sh_g))

    np.testing.assert_array_equal(codes_sh, want_codes)
    scale = np.abs(wav_ref).max() + 1e-9
    max_rel = np.abs(wav_sh - wav_ref).max() / scale
    assert np.allclose(wav_sh, wav_ref, atol=2e-4 * scale), (
        f"2-proc sharded cascade waveform diverges: max rel {max_rel:.2e}"
    )
    print(f"CASCADE_OK pid={pid} wav={wav_sh.shape} max_rel={max_rel:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
