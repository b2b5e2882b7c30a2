"""Interactive TPU lab: build the full-size bench engine ONCE, then drive
experiments from the REPL (python -i tools/tpu_lab.py). Through the axon
tunnel, XLA compile-cache hits do not survive process restarts, so every
fresh process pays minutes of compiles — this keeps one process (and one
chip claim) alive across a whole measurement campaign.

Helpers:
  engine, cfg, spk, text, prompt  — bench fixtures (random weights, quant)
  timeit(fn, n=3)                 — best-of-n wall time (fn must sync itself)
  decode_bench(B, max_new=400)    — batched decode tok/s (same as bench.py)
  e2e_batched(B, sync=False)      — batched e2e audio-sec/s (+ stage table)
  single_stream(n=3)              — sequential audio-sec/s + stage totals
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILE_CACHE", "/tmp/indextts_tpu_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import IndexTTS2Config, RuntimeConfig
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params

print("device:", jax.devices()[0], flush=True)

QUANT = os.environ.get("LAB_QUANT", "1") == "1"
FAST_DT = "bfloat16" if QUANT else "float32"  # match bench.py's fast bundle
cfg = IndexTTS2Config(
    runtime=RuntimeConfig(
        diffusion_steps=int(os.environ.get("LAB_DIFFUSION_STEPS", "20")),
        kv_quant=QUANT, gpt_quantize=QUANT,
        head_quant=os.environ.get("LAB_HEAD_QUANT", "0") == "1",
        s2mel_dtype=os.environ.get("LAB_S2MEL_DTYPE", FAST_DT),
        voc_dtype=os.environ.get("LAB_VOC_DTYPE", FAST_DT),
    )
)
t0 = time.perf_counter()
params = random_params(cfg, seed=None)
print(f"params initialized in {time.perf_counter() - t0:.1f}s", flush=True)

engine = IndexTTS2Engine(cfg, params, gpt_dtype=jnp.bfloat16)
engine.decoder = GPTDecoder(
    engine.gpt, cfg.gpt,
    SamplingConfig(do_sample=True, top_k=30, ban_stop_token=True),
)

rng = np.random.default_rng(0)
SR = 16000
prompt = (rng.standard_normal(5 * SR) * 0.1).astype(np.float32)
N_TEXT = 64
N_CODES = int(os.environ.get("LAB_MEL_TOKENS", "400"))
text = rng.integers(2, cfg.gpt.number_text_tokens, N_TEXT)


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def single_stream(n=3, **kw):
    out = engine.infer((prompt, SR), [text], seed=0, max_mel_tokens=N_CODES,
                       num_beams=1, do_sample=True, **kw)  # compile/warm
    wall = 0.0
    audio = 0.0
    stages = {"gpt_gen": 0.0, "gpt_fwd": 0.0, "s2mel": 0.0, "bigvgan": 0.0}
    for i in range(n):
        t0 = time.perf_counter()
        out = engine.infer((prompt, SR), [text], seed=i + 1,
                           max_mel_tokens=N_CODES, num_beams=1,
                           do_sample=True, **kw)
        wall += time.perf_counter() - t0
        audio += out["duration_sec"]
        for s in out["stats"]:
            stages["gpt_gen"] += s.gpt_gen_time
            stages["gpt_fwd"] += s.gpt_forward_time
            stages["s2mel"] += s.s2mel_time
            stages["bigvgan"] += s.bigvgan_time
    print(f"single-stream: {audio / wall:.2f} audio-s/s  stages/{n}runs:",
          {k: round(v, 3) for k, v in stages.items()}, flush=True)
    return audio / wall


def _spk():
    return engine.prepare_speaker(prompt, SR, cache_key="lab")


def decode_bench(B, max_new=None, n=3):
    max_new = max_new or N_CODES
    spk = _spk()
    emovec = engine._emovec_program(
        engine.p_gpt, spk.spk_cond_emb, spk.spk_cond_emb,
        jnp.asarray([spk.cond_len]), jnp.asarray([spk.cond_len]),
        jnp.asarray(1.0, jnp.float32),
    )
    conds = engine._build_conds_program(engine.p_gpt, spk.spk_latents, emovec)
    conds_b = jnp.repeat(conds, B, axis=0)
    ids, pos, valid = engine.decoder.build_text_prompt_arrays(
        np.tile(text[None], (B, 1)), np.full(B, N_TEXT), bucket=N_TEXT
    )
    kb = jax.random.PRNGKey(7)

    def run():
        res = engine.decoder.generate(
            {"params": engine.p_gpt}, conds_b, jnp.asarray(ids),
            jnp.asarray(pos), jnp.asarray(valid), kb, max_new=max_new,
        )
        np.asarray(res.codes)

    run()  # compile
    bt = timeit(run, n)
    print(f"decode B={B} max_new={max_new}: {bt:.3f}s -> "
          f"{B * max_new / bt:.0f} tok/s", flush=True)
    return B * max_new / bt


def e2e_batched(B=8, sync=False, n=2):
    segs = [text for _ in range(B)]
    if sync:
        os.environ["TARS_STAGE_SYNC"] = "1"
    try:
        for rep in range(n):
            t0 = time.perf_counter()
            out = engine.infer((prompt, SR), segs, seed=11,
                               max_mel_tokens=N_CODES, batched=True,
                               num_beams=1, do_sample=True)
            bt = time.perf_counter() - t0
    finally:
        os.environ.pop("TARS_STAGE_SYNC", None)
    aps = out["duration_sec"] / bt
    print(f"batched e2e B={B}: wall={bt:.2f}s -> {aps:.2f} audio-s/s  "
          f"stages: {getattr(engine, '_last_batched_stats', None)}",
          flush=True)
    return aps


def s2mel_bench(B=8, n_codes=None, n=3):
    """Isolate the batched CFM stage: latent+codes fixtures at bench shapes,
    time just the jitted s2mel program (regulator + 20-step Euler DiT solve)."""
    n_codes = n_codes or N_CODES
    spk = _spk()
    from indextts_tpu.runtime.engine import next_bucket

    code_bucket = next_bucket(n_codes, 64, 64)
    codes_arr = np.full((B, code_bucket), cfg.gpt.stop_mel_token, np.int32)
    codes_arr[:, :n_codes] = rng.integers(0, 8000, (B, n_codes))
    code_lens = np.full(B, n_codes)
    latent = jnp.zeros((B, code_bucket, cfg.gpt.model_dim), jnp.float32)
    target_exact = (code_lens * 1.72).astype(np.int64)
    target_len = next_bucket(int(target_exact.max()), 128, 128)
    total_len = spk.ref_mel_len + target_len
    noise = jax.random.normal(
        jax.random.PRNGKey(5),
        (B, cfg.s2mel.dit.in_channels, total_len), jnp.float32)

    def run():
        vc = engine._s2mel_program(
            engine.p_s2mel, engine.p_repcodec, latent,
            jnp.asarray(codes_arr), jnp.asarray(code_lens),
            spk.prompt_condition, spk.ref_mel, jnp.asarray(spk.ref_mel_len),
            spk.style, noise, target_len=target_len, total_len=total_len,
        )
        np.asarray(vc[0, 0, 0])

    run()  # compile
    bt = timeit(run, n)
    print(f"s2mel B={B} T={total_len}: {bt:.3f}s", flush=True)
    return bt


def dit_bench(B=8, T=1152, n=5):
    """One DiT velocity forward at CFM-solve shapes (2B CFG stack), plus the
    isolated WaveNet final-stack and the transformer-only cost (by
    subtracting a WaveNet-only run is noisy; we time submodules directly)."""
    import functools
    from indextts_tpu.models.s2mel import S2Mel, WaveNet, DiTTransformer

    dt = engine._s2mel_dt
    B2 = 2 * B
    x = jnp.zeros((B2, 80, T), jnp.float32)
    prompt_x = jnp.zeros((B2, 80, T), dt)
    x_lens = jnp.full((B2,), T - 64, jnp.int32)
    t = jnp.full((B2,), 0.5, jnp.float32)
    style = jnp.zeros((B2, 192), dt)
    mu = jnp.zeros((B2, T, 512), dt)

    vel = jax.jit(lambda p, xx: engine.s2mel.apply(
        p, xx.astype(dt), prompt_x, x_lens, t, style, mu,
        method=S2Mel.velocity))
    p = {"params": engine.p_s2mel}

    def run():
        np.asarray(vel(p, x)[0, 0, 0])

    run()
    bt = timeit(run, n)
    print(f"velocity fwd 2B={B2} T={T}: {bt*1000:.1f} ms "
          f"(x20 steps = {20*bt:.2f}s)", flush=True)

    # isolated WaveNet stack at the same shapes
    wn_mod = WaveNet(cfg.s2mel.wavenet)
    h = jnp.zeros((B2, T, 512), dt)
    mask3 = jnp.ones((B2, T, 1), dt)
    g = jnp.zeros((B2, 1, 512), dt)
    wp = wn_mod.init(jax.random.PRNGKey(0), h, mask3, g)
    wn_fn = jax.jit(lambda pp, hh: wn_mod.apply(pp, hh, mask3, g))

    def run_wn():
        np.asarray(wn_fn(wp, h)[0, 0, 0])

    run_wn()
    wt = timeit(run_wn, n)
    print(f"wavenet-only 2B={B2} T={T}: {wt*1000:.1f} ms "
          f"(x20 = {20*wt:.2f}s)", flush=True)
    return bt, wt


def cfm_flash_ab(B=8, n=3):
    """A/B the DiT flash-attention path inside the full batched s2mel stage."""
    for flash in ("1", "0"):
        os.environ["TARS_DIT_FLASH"] = flash
        engine._s2mel_program = jax.jit(
            engine._s2mel_mel, static_argnames=("target_len", "total_len"))
        bt = s2mel_bench(B, n=n)
        print(f"  TARS_DIT_FLASH={flash}: {bt:.3f}s", flush=True)
    os.environ.pop("TARS_DIT_FLASH", None)


def profile_trace(fn, outdir="/tmp/jtrace", warm=True):
    """jax.profiler trace around fn(); inspect with
    python -m tensorboard.main --logdir <outdir> or xprof tooling."""
    if warm:
        fn()
    with jax.profiler.trace(outdir):
        fn()
    print("trace written to", outdir, flush=True)


print("lab ready: single_stream() / decode_bench(B) / e2e_batched(B, sync=) /"
      " s2mel_bench(B) / profile_trace(fn)", flush=True)
