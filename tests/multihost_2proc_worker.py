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
     token-identical to the single-process unsharded loop.

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
    print(f"WORKER_OK pid={pid} codes={got_codes.shape}", flush=True)


if __name__ == "__main__":
    main()
