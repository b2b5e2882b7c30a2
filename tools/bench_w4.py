"""W4A8 vs W8A8 B=1 decode bench (full-size GPT, random weights, one TPU).

The B=1 decode step is weight-HBM-bound (~470MB int8 GPT stream/step at W8);
W4 packs two nibbles per byte and unpacks inside the streaming Pallas
gemv_w4/mlp_w4 kernels, halving that stream. This measures whether the
unpack cost is hidden behind the DMA (it should be: VPU shifts vs HBM wait)
so the TARS_GPT_WBITS=4 serving knob is documented from numbers.

Timing: np.asarray(res.codes) forces sync (block_until_ready returns early
on the tunneled backend)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILE_CACHE", "/tmp/indextts_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from indextts_tpu.config import IndexTTS2Config
from indextts_tpu.models.unified_voice import UnifiedVoice
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
from indextts_tpu.runtime.engine import random_params
from indextts_tpu.runtime.torch_convert import quantize_gpt_tree

print("device:", jax.devices()[0], flush=True)
cfg = IndexTTS2Config()
raw = random_params(cfg)["gpt"]


def to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating)
        and x.dtype == jnp.float32 and x.ndim > 1 else x,
        tree,
    )


sc = SamplingConfig(ban_stop_token=True)
MN = int(os.environ.get("BENCH_W4_STEPS", "400"))


def run(model, params, tag, B=1):
    dec = GPTDecoder(model, cfg.gpt, sc)
    rng = np.random.default_rng(0)
    conds = jnp.zeros((B, 34, cfg.gpt.model_dim), jnp.bfloat16)
    text = rng.integers(2, 12000, (B, 64))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.full(B, 64), 64)
    k = jax.random.PRNGKey(0)
    args = (params, conds, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid), k)
    r = dec.generate(*args, max_new=MN)
    np.asarray(r.codes)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = dec.generate(*args, max_new=MN)
        np.asarray(r.codes)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:36s} B={B:2d}: {best:.3f}s = {best/MN*1e3:.3f} ms/step, "
          f"{B*MN/best:.0f} tok/s", flush=True)
    return B * MN / best


p8 = {"params": jax.device_put(to_bf16(quantize_gpt_tree(raw)))}
m8 = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                  kv_quant=True, attn_impl="xla", gemv_impl="xla")
t8 = run(m8, p8, "w8+kv8 xla (current default)")
del p8

p4 = {"params": jax.device_put(to_bf16(quantize_gpt_tree(raw, bits=4)))}
m4p = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True, wbits=4,
                   kv_quant=True, attn_impl="xla", gemv_impl="pallas")
t4 = run(m4p, p4, "W4+kv8 gemv=PALLAS (packed)")

m4x = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True, wbits=4,
                   kv_quant=True, attn_impl="xla", gemv_impl="xla")
if os.environ.get("BENCH_W4_XLA", "0") == "1":
    run(m4x, p4, "W4+kv8 gemv=xla (unpack/step)")

print(f"w4/w8 speedup: {t4 / t8:.2f}x", flush=True)
