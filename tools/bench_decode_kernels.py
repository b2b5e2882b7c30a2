"""Decode-kernel ablation bench (full-size GPT, random weights, one TPU claim).

Measures every decode-runtime kernel combination so dispatch defaults
(TARS_ATTN_IMPL auto route, TARS_Q8_VARIANT, TARS_GEMV_MAX_ROWS, head_quant)
are set from numbers, not guesses:
1. B=1 full-size decode: gemv pallas on/off (xla attn + kv8, and pallas_q8)
2. B=8/16: xla+kvq vs pallas_q8 grid variant (BLKQ 256 / 512)
Timing: np.asarray(res.codes) forces sync (codes are tiny; d2h ok)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

# persistent compile cache: the sweep is compile-dominated (~12 full-size
# decode-program variants); warm reruns skip straight to the measurements
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
qparams = {"params": jax.device_put(quantize_gpt_tree(raw))}
qparams = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16)
    if jnp.issubdtype(x.dtype, jnp.floating)
    and x.dtype == jnp.float32 and x.ndim > 1 else x,
    qparams)
sc = SamplingConfig(ban_stop_token=True)
MN = 400

def run(model, tag, B, blkq=None, variant=None, max_new=MN, gemv_rows=None,
        phase=None):
    if variant is not None:
        os.environ["TARS_Q8_VARIANT"] = variant
    if gemv_rows is not None:
        os.environ["TARS_GEMV_MAX_ROWS"] = str(gemv_rows)
    dec = GPTDecoder(model, cfg.gpt, sc)
    if blkq is not None:
        dec.BLKQ = blkq
    if phase is not None:
        # phased static-prefix attention reads (decode.py TARS_DECODE_PHASE)
        dec.PHASE = phase
    rng = np.random.default_rng(0)
    conds = jnp.zeros((B, 34, cfg.gpt.model_dim), jnp.bfloat16)
    text = rng.integers(2, 12000, (B, 64))
    ids, pos, valid = dec.build_text_prompt_arrays(text, np.full(B, 64), 64)
    k = jax.random.PRNGKey(0)
    args = (qparams, conds, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid), k)
    r = dec.generate(*args, max_new=max_new)
    np.asarray(r.codes)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = dec.generate(*args, max_new=max_new)
        np.asarray(r.codes)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:34s} B={B:2d}: {best:.3f}s = {best/max_new*1e3:.3f} ms/step, "
          f"{B*max_new/best:.0f} tok/s", flush=True)

# ---- B=1 single-stream --------------------------------------------------
m_kv8_x = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                       kv_quant=True, attn_impl="xla", gemv_impl="xla")
run(m_kv8_x, "w8+kv8 xla-attn gemv=xla", 1)
m_kv8_g = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                       kv_quant=True, attn_impl="xla", gemv_impl="pallas")
run(m_kv8_g, "w8+kv8 xla-attn gemv=PALLAS", 1)
m_q8_g = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                      attn_impl="pallas_q8", gemv_impl="pallas")
run(m_q8_g, "w8 pq8-attn(dma) gemv=PALLAS", 1, variant="dma")
m_q8_gr1 = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                        attn_impl="pallas_q8", gemv_impl="pallas")
run(m_q8_gr1, "w8 pq8-attn(GRID) gemv=PALLAS", 1, variant="grid")

# ---- head_quant: int8 logits head on top of the best B=1 combo ----------
hq_raw = quantize_gpt_tree(raw, head=True)
hqparams = {"params": jax.device_put(hq_raw)}
hqparams = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16)
    if jnp.issubdtype(x.dtype, jnp.floating)
    and x.dtype == jnp.float32 and x.ndim > 1 else x,
    hqparams)
_saved = globals()["qparams"]
globals()["qparams"] = hqparams
m_hq = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                    head_quant=True, attn_impl="pallas_q8",
                    gemv_impl="pallas")
run(m_hq, "w8+HEADQ pq8-attn gemv=PALLAS", 1, variant="dma")
m_hq2 = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                     head_quant=True, kv_quant=True, attn_impl="xla",
                     gemv_impl="pallas")
run(m_hq2, "w8+kv8+HEADQ xla gemv=PALLAS", 1)
globals()["qparams"] = _saved

# ---- gemv threshold sweep: does the streaming kernel win at 8 rows? ----
m_kv8_g8 = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                        kv_quant=True, attn_impl="xla", gemv_impl="pallas")
run(m_kv8_g8, "w8+kv8 xla-attn gemv rows<=8", 8, gemv_rows=8)

# ---- B>=8 batched --------------------------------------------------------
m_kvq_b = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                       kv_quant=True, attn_impl="xla", gemv_impl="xla")
run(m_kvq_b, "w8+kv8 xla-attn (default)", 8)
m_q8gr = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                      attn_impl="pallas_q8", gemv_impl="xla")
run(m_q8gr, "w8 pq8-attn GRID blk256", 8, blkq=256, variant="grid")
m_q8gr2 = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                       attn_impl="pallas_q8", gemv_impl="xla")
run(m_q8gr2, "w8 pq8-attn GRID blk512", 8, blkq=512, variant="grid")
run(m_kvq_b, "w8+kv8 xla-attn (default)", 16)
m_q8gr3 = UnifiedVoice(cfg.gpt, dtype=jnp.bfloat16, quantize_gpt=True,
                       attn_impl="pallas_q8", gemv_impl="xla")
run(m_q8gr3, "w8 pq8-attn GRID blk256", 16, blkq=256, variant="grid")

# ---- phased prefix-bounded reads (TARS_DECODE_PHASE) ---------------------
# r3 verdict on v5e at cap=S+400: LOSES to the full-cap read at every B
# (B=8 3655 vs 3826 tok/s, B=16 3590 vs 4380) — the sequential while_loop
# phases cost more than the saved KV stream at this cap. Kept opt-in; rerun
# at serving caps (S+1500) on future hardware.
run(m_kvq_b, "w8+kv8 xla PHASED256", 8, phase=256)
run(m_kvq_b, "w8+kv8 xla PHASED256", 16, phase=256)
print("done", flush=True)
