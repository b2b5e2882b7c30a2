#!/usr/bin/env python
"""A/B the s2mel CFM solve (fp32 vs bf16 estimator) at serving shapes.

The bf16 s2mel option (config.runtime.s2mel_dtype / TARS_S2MEL_DTYPE) casts
params + DiT estimator activations to bf16 with fp32 Euler/norm/softmax
islands; fidelity is bounded by tests/test_s2mel_parity.py
(test_cfm_bf16_estimator_close). This tool measures whether it actually wins
on the current accelerator so the default is set from numbers, mirroring
tools/bench_decode_kernels.py for the decode kernels.

Usage: python tools/bench_s2mel.py [--steps 20] [--iters 5]
Prints per-shape wall times and the bf16/fp32 speedup.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--shapes", default="1x256,1x512,8x512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import IndexTTS2Config
    from indextts_tpu.models.s2mel import S2Mel
    from indextts_tpu.runtime.s2mel_infer import cfm_inference

    cfg = IndexTTS2Config()
    model = S2Mel(cfg.s2mel)
    mel = cfg.s2mel.dit.in_channels
    content = cfg.s2mel.dit.content_dim
    style_dim = cfg.s2mel.dit.style_dim

    key = jax.random.PRNGKey(0)
    Ti = 16
    params = model.init(
        key,
        jnp.zeros((1, mel, Ti)),
        jnp.zeros((1, mel, Ti)),
        jnp.array([Ti]),
        jnp.zeros((1,)),
        jnp.zeros((1, style_dim)),
        jnp.zeros((1, Ti, content)),
        method=S2Mel.velocity,
    )
    params = jax.device_put(params)
    p_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    results = {}
    for shape in args.shapes.split(","):
        B, T = (int(v) for v in shape.split("x"))
        P = T // 4
        mu = jnp.asarray(rng.standard_normal((B, T, content)), jnp.float32)
        x_lens = jnp.full((B,), T, jnp.int32)
        prompt_x = np.zeros((B, mel, T), np.float32)
        prompt_x[:, :, :P] = rng.standard_normal((B, mel, P))
        prompt_x = jnp.asarray(prompt_x)
        style = jnp.asarray(rng.standard_normal((B, style_dim)), jnp.float32)
        noise = jnp.asarray(rng.standard_normal((B, mel, T)), jnp.float32)
        a = (mu, x_lens, prompt_x, jnp.asarray(P), style, noise)

        for name, p, dt in (
            ("fp32", params, jnp.float32),
            ("bf16", p_bf16, jnp.bfloat16),
        ):
            out = cfm_inference(
                model, p, *a, n_steps=args.steps, cfg_rate=0.7, dtype=dt
            )
            # a 1-element fetch is the only reliable sync through the
            # tunneled backend (block_until_ready returns early there)
            float(out.sum())  # compile + sync
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = cfm_inference(
                    model, p, *a, n_steps=args.steps, cfg_rate=0.7, dtype=dt
                )
            float(out.sum())
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            results[(shape, name)] = ms
            print(f"B={B} T={T} {name}: {ms:8.2f} ms / solve", file=sys.stderr)
        f, b = results[(shape, "fp32")], results[(shape, "bf16")]
        print(f"B={B} T={T} bf16 speedup: {f / b:.2f}x", file=sys.stderr)

    print(
        {
            f"{s}_{n}_ms": round(v, 2)
            for (s, n), v in sorted(results.items())
        }
    )


if __name__ == "__main__":
    main()
