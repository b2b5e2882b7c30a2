#!/usr/bin/env python
"""Fine-tuning driver: sharded training steps + Orbax checkpoints + resume.

The reference is inference-only (no training loop, no training checkpoint
writing — SURVEY §5); the objectives its modules carry are implemented in
`runtime/train.py` (GPT dual-head CE, model_v2.py:597-625 analog; CFM
flow matching, flow_matching.py:116-159 parity). This driver turns them
into a runnable job:

  * mesh: (data, model) via `parallel/multihost.global_mesh` — DP over
    hosts/DCN, TP over ICI with the production partition rules; works
    unchanged on the single-chip and virtual-CPU meshes,
  * data: `--data-dir` of .npz batch files (keys = the train-step batch
    keys), or `--synthetic` random batches at config shapes (pipeline
    smoke / throughput measurement without a corpus),
  * checkpoints: Orbax save of {params, opt_state, step} every
    `--save-every` steps under `--out-dir`; `--resume` (default on) picks
    up the latest automatically — the multi-process env contract is the
    same TARS_COORDINATOR/TARS_NUM_PROCESSES/TARS_PROCESS_ID one the
    server uses.

Examples:
  python tools/finetune.py --target gpt --synthetic 8 --steps 50 \\
      --out-dir /ckpts/ft --model-parallel 2
  python tools/finetune.py --target cfm --data-dir batches/ --steps 1000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthetic_gpt_batch(cfg, B, rng):
    import numpy as np

    g = cfg.gpt
    Lt, Lm = min(24, g.max_text_tokens), min(32, g.max_mel_tokens)
    return {
        "spk_latents": rng.standard_normal(
            (B, g.condition_num_latent, g.model_dim)).astype(np.float32),
        "text_ids": rng.integers(2, g.number_text_tokens, (B, Lt)).astype(np.int32),
        "text_lens": rng.integers(Lt // 2, Lt + 1, (B,)).astype(np.int32),
        "mel_codes": rng.integers(0, g.start_mel_token, (B, Lm)).astype(np.int32),
        "mel_lens": rng.integers(Lm // 2, Lm + 1, (B,)).astype(np.int32),
        "emovec": rng.standard_normal((B, g.model_dim)).astype(np.float32),
    }


def synthetic_cfm_batch(cfg, B, rng):
    import numpy as np

    T = 64
    d = cfg.s2mel.dit
    return {
        "x1": rng.standard_normal((B, d.in_channels, T)).astype(np.float32),
        "x_lens": rng.integers(T // 2, T + 1, (B,)).astype(np.int32),
        "prompt_lens": rng.integers(4, 12, (B,)).astype(np.int32),
        "mu": rng.standard_normal((B, T, d.content_dim)).astype(np.float32),
        "style": rng.standard_normal((B, d.style_dim)).astype(np.float32),
    }


def batch_stream(args, cfg, B):
    import numpy as np

    if args.data_dir:
        files = sorted(Path(args.data_dir).glob("*.npz"))
        if not files:
            raise SystemExit(f"no .npz batches under {args.data_dir}")
        i = 0
        while True:
            with np.load(files[i % len(files)]) as z:
                yield {k: z[k] for k in z.files}
            i += 1
    else:
        rng = np.random.default_rng(args.seed)
        make = synthetic_gpt_batch if args.target == "gpt" else synthetic_cfm_batch
        while True:
            yield make(cfg, B, rng)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--target", choices=["gpt", "cfm"], default="gpt")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--data-dir", default=None,
                    help=".npz batch files (keys = train-step batch keys)")
    ap.add_argument("--synthetic", type=int, default=None, metavar="B",
                    help="random batches of this size at config shapes")
    ap.add_argument("--out-dir", default=None, help="Orbax checkpoint dir")
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cfg", default=None, help="config.yaml (default: reference)")
    ap.add_argument("--init-from", default=None,
                    help="checkpoint dir to fine-tune from (loader formats)")
    args = ap.parse_args(argv)
    if args.synthetic:
        args.batch = args.synthetic

    from indextts_tpu.parallel.multihost import (
        global_mesh,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from indextts_tpu.config import load_config
    from indextts_tpu.models.s2mel import S2Mel
    from indextts_tpu.models.unified_voice import UnifiedVoice
    from indextts_tpu.parallel.sharding import (
        DIT_PARTITION_RULES,
        GPT_PARTITION_RULES,
        shard_params,
    )
    from indextts_tpu.runtime import train as T
    from indextts_tpu.runtime.loader import _orbax_restore

    cfg = load_config(args.cfg)
    mesh = global_mesh(model=args.model_parallel)
    data_size = mesh.shape["data"]
    if args.batch % data_size:
        raise SystemExit(
            f"--batch {args.batch} must be divisible by the data axis "
            f"({data_size} = devices/model_parallel)"
        )
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    # params: resume > init-from > random init
    if args.init_from:
        from indextts_tpu.runtime.loader import convert_reference_checkpoints

        all_params, _ = convert_reference_checkpoints(args.init_from, cfg)
        params = {"params": all_params["gpt" if args.target == "gpt" else "s2mel"]}
    elif args.target == "gpt":
        # init through the TRAINING forward (random_params uses the
        # inference forward_latent, which never instantiates text_head)
        model0 = UnifiedVoice(cfg.gpt)
        b = synthetic_gpt_batch(cfg, 1, np.random.default_rng(args.seed))
        params = model0.init(
            jax.random.PRNGKey(args.seed),
            jnp.asarray(b["spk_latents"]), jnp.asarray(b["text_ids"]),
            jnp.asarray(b["text_lens"]), jnp.asarray(b["mel_codes"]),
            jnp.asarray(b["mel_lens"]), jnp.asarray(b["emovec"]),
            method=UnifiedVoice.forward_train,
        )
    else:
        from indextts_tpu.runtime.engine import random_params

        full = random_params(cfg, seed=args.seed)
        params = {"params": full["s2mel"]}

    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)
    step0 = 0
    ckpt_dir = Path(args.out_dir) if args.out_dir else None
    if ckpt_dir and not args.no_resume and (ckpt_dir / "latest" / "params").exists():
        params = _orbax_restore(ckpt_dir / "latest" / "params")
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt_state),
            jax.tree_util.tree_leaves(
                _orbax_restore(ckpt_dir / "latest" / "opt_state")
            ),
        )
        step0 = int(json.loads((ckpt_dir / "latest" / "meta.json").read_text())["step"])
        print(f"resumed from step {step0}", file=sys.stderr)

    rules = GPT_PARTITION_RULES if args.target == "gpt" else DIT_PARTITION_RULES
    with mesh:
        params = {"params": shard_params(params["params"], mesh, rules)}
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl)
            if not hasattr(x, "sharding") else x,
            opt_state,
        )

    if args.target == "gpt":
        model = UnifiedVoice(cfg.gpt)
        step_fn = jax.jit(T.make_train_step(model, opt))

        def run_step(p, o, b, key):
            return step_fn(p, o, b)
    else:
        model = S2Mel(cfg.s2mel)
        cfm_step = jax.jit(T.make_cfm_train_step(model, opt))

        def run_step(p, o, b, key):
            return cfm_step(p, o, b, key)

    stream = batch_stream(args, cfg, args.batch)
    key = jax.random.PRNGKey(args.seed)
    losses = []
    t_start = time.perf_counter()
    with mesh:
        for step in range(step0, step0 + args.steps):
            host = next(stream)
            batch = {k: jax.device_put(v, data_sh) for k, v in host.items()}
            key, sub = jax.random.split(key)
            params, opt_state, loss = run_step(params, opt_state, batch, sub)
            if (step + 1) % args.log_every == 0 or step == step0:
                lv = float(loss)
                losses.append(lv)
                print(f"step {step + 1}: loss {lv:.4f}", file=sys.stderr)
                if not np.isfinite(lv):
                    raise SystemExit(f"non-finite loss at step {step + 1}")
            if ckpt_dir and (step + 1) % args.save_every == 0:
                _save(ckpt_dir, params, opt_state, step + 1)
    if ckpt_dir:
        _save(ckpt_dir, params, opt_state, step0 + args.steps)
    wall = time.perf_counter() - t_start
    out = {
        "target": args.target,
        "steps": args.steps,
        "from_step": step0,
        "final_step": step0 + args.steps,
        "batch": args.batch,
        "mesh": dict(mesh.shape),
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "steps_per_s": round(args.steps / wall, 3),
    }
    print(json.dumps(out))
    return out


def _save(ckpt_dir: Path, params, opt_state, step: int) -> None:
    import jax

    from indextts_tpu.runtime.loader import _orbax_save

    # multi-host: one writer (params/opt_state are identical across
    # processes after device_get); concurrent Orbax saves to the same
    # directory race on the atomic-rename protocol
    if jax.process_index() != 0:
        return
    tgt = ckpt_dir / "latest"
    host_params = jax.tree_util.tree_map(lambda x: jax.device_get(x), params)
    host_opt = jax.tree_util.tree_map(lambda x: jax.device_get(x), opt_state)
    # flatten opt_state to a plain tree orbax can store
    # zero-padded keys: restore rebuilds by tree_leaves order, which sorts
    # dict keys lexicographically
    flat = {
        f"l{i:05d}": l
        for i, l in enumerate(jax.tree_util.tree_leaves(host_opt))
    }
    _orbax_save(tgt / "params", host_params)
    _orbax_save(tgt / "opt_state", flat)
    (tgt / "meta.json").write_text(json.dumps({"step": step}) + "\n")


if __name__ == "__main__":
    main()
