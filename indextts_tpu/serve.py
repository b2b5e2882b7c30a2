"""TTS server entrypoint (reference: serve_tars.py).

  python -m indextts_tpu.serve --model-dir checkpoints --port 8000

Env knobs keep the TARS_* names (serve_tars.py:52-93): TARS_MAX_CONCURRENCY,
TARS_ENABLE_STREAMING, TARS_REFERENCE_AUDIO, TARS_WARMUP,
TARS_DIFFUSION_STEPS, TARS_CFG_RATE.
"""

from __future__ import annotations

import argparse
import sys
import time


def pick_continuous_slots(env: dict) -> int:
    """Serving-mode selection at the measured crossover
    (docs/DEPLOYMENT.md 'pick by workload shape' table).

    TARS_CONTINUOUS_SLOTS=auto (the default) picks from the declared
    fan-in: sequential (0 slots, lowest TTFB: p50 1.69 vs 2.53 s,
    BENCH_SERVER_r04.json) while TARS_MAX_CONCURRENCY <= 3, continuous
    batching with one slot per admitted request (capped at 8) from 4 up —
    where the shared AR loop measured 1.92x aggregate at high fan-in
    (BENCH_SERVER_r03.json) and ties sequential on multi-segment traffic
    with the tail-worker pool (BENCH_TAIL_r04.json). An explicit integer
    keeps the choice manual."""
    raw = env.get("TARS_CONTINUOUS_SLOTS", "auto")
    if raw != "auto":
        return int(raw)
    max_conc = int(env.get("TARS_MAX_CONCURRENCY", "1"))
    return min(max_conc, 8) if max_conc >= 4 else 0


def main(argv=None):
    import os

    p = argparse.ArgumentParser(
        prog="indextts-tpu-serve",
        epilog="Serving-mode selection (sequential vs continuous batching "
               "vs tail workers) is automatic at the measured crossover; "
               "see the decision table in docs/DEPLOYMENT.md and override "
               "with TARS_CONTINUOUS_SLOTS / TARS_MAX_CONCURRENCY / "
               "TARS_CONTINUOUS_TAIL_WORKERS.",
    )
    # env fallbacks mirror the reference server (serve_tars.py TARS_* contract)
    p.add_argument("--model-dir", default=os.environ.get("TARS_CHECKPOINT_DIR"))
    p.add_argument("--cfg", default=os.environ.get("TARS_CONFIG_FILE"))
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--reference-audio", default=None,
                   help="default speaker prompt wav")
    p.add_argument("--num-beams", type=int,
                   default=int(os.environ.get("TARS_NUM_BEAMS", "1")),
                   help="decode route for serving. Default 1 (the jitted "
                        "sampling loop): the beam-multinomial route is ~1.9x "
                        "slower e2e for the same sampling-mode output "
                        "quality class (BENCH beam3_audio_s vs the headline), "
                        "and the reference's own accelerated serving path "
                        "ignores num_beams too (model_v2.py:871-883). Set 3 "
                        "for the reference HF-default beam-multinomial route.")
    args = p.parse_args(argv)
    # the engine reads runtime.num_beams from the env-built config
    os.environ["TARS_NUM_BEAMS"] = str(args.num_beams)

    # multi-host jobs (DP over hosts): initialize jax.distributed before any
    # device use; strict no-op for the single-process case
    from indextts_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()

    # persistent XLA compile cache, keyed under the model dir so different
    # checkpoints don't collide (reference: serve_tars.py:143-199 persists its
    # torch.compile cache the same way). On the axon-tunneled TPU cross-process
    # hits are backend-dependent; the cache is still correct and costs nothing.
    import hashlib

    import jax

    cache_key = hashlib.sha256((args.model_dir or "random").encode()).hexdigest()[:12]
    cache_dir = os.environ.get(
        "JAX_COMPILE_CACHE", f"/tmp/indextts_tpu_jax_cache_{cache_key}"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f">> compile cache unavailable: {e}", file=sys.stderr)

    from indextts_tpu.config import load_config
    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params
    from indextts_tpu.runtime.server import ServerSettings, TTSServer
    from indextts_tpu.utils.obs import GracefulShutdown, print_stage, setup_logging

    setup_logging()
    t0 = time.perf_counter()
    print_stage("Loading models", "progress")
    if args.model_dir:
        from indextts_tpu.runtime.loader import load_engine

        engine = load_engine(args.model_dir, cfg_path=args.cfg)
    else:
        print(">> no --model-dir: random weights (smoke-test mode)", file=sys.stderr)
        cfg = load_config(args.cfg)
        engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    print_stage("Models loaded", "complete", time.perf_counter() - t0)

    # attach the Qwen emotion model when the checkpoint dir ships it
    # (reference lazy-loads qwen0.6bemo4-merge, infer_v2.py:321-328)
    if args.model_dir:
        from pathlib import Path

        qdir = Path(args.model_dir) / "qwen0.6bemo4-merge"
        if qdir.is_dir():
            try:
                from indextts_tpu.runtime.qwen_emo import build_qwen_emotion

                engine.qwen_emo = build_qwen_emotion(str(qdir))
                print_stage("Qwen emotion model attached", "complete")
            except Exception as e:  # degraded mode, like the reference ladders
                print_stage("Qwen emotion load failed", "failed",
                            message_extra=str(e))

    settings = ServerSettings(host=args.host, port=args.port)
    default_prompt = args.reference_audio or settings.reference_audio or None

    import numpy as np

    def _emo_kwargs(text, use_emo_text, emo_text, emo_vector):
        """webui emotion mode 3: derive the 8-dim vector from text
        (infer_v2.py:586-598). ValueError -> HTTP 400 in the server."""
        if not use_emo_text:
            return emo_vector
        qe = getattr(engine, "qwen_emo", None)
        if qe is None:
            raise ValueError(
                "use_emo_text requested but no Qwen emotion model is loaded "
                "(checkpoint dir lacks qwen0.6bemo4-merge)"
            )
        return list(qe.inference(emo_text if emo_text else text).values())

    # continuous batching: TARS_CONTINUOUS_SLOTS>1 runs every request's
    # segments through one shared chunked AR loop (requests from different
    # clients batch dynamically). Default "auto" picks by declared fan-in
    # (TARS_MAX_CONCURRENCY) at the measured crossover — see
    # pick_continuous_slots / docs/DEPLOYMENT.md.
    cont_slots = pick_continuous_slots(os.environ)
    if (cont_slots > 1
            and os.environ.get("TARS_CONTINUOUS_SLOTS", "auto") == "auto"):
        # auto keyed on the DECLARED cap, not live fan-in: say so, loudly,
        # with the override — an operator using MAX_CONCURRENCY purely as a
        # safety cap at low real traffic wants TARS_CONTINUOUS_SLOTS=0
        print_stage(
            f"Auto-picked continuous batching ({cont_slots} slots) from "
            f"TARS_MAX_CONCURRENCY; set TARS_CONTINUOUS_SLOTS=0 for the "
            f"sequential route if real fan-in is low "
            f"(docs/DEPLOYMENT.md decision table)",
            "complete",
        )
    service = None
    if cont_slots > 1:
        from indextts_tpu.runtime.batcher import ContinuousService

        service = ContinuousService(
            engine,
            n_slots=cont_slots,
            text_bucket=engine.cfg.runtime.max_text_tokens_per_segment,
            chunk_steps=int(os.environ.get("TARS_CONTINUOUS_CHUNK", "32")),
            # cascade tails run off the decode thread so a finished segment's
            # blocking PCM d2h doesn't stall the shared AR loop (see
            # ContinuousService docstring for the measured rationale)
            tail_workers=int(
                os.environ.get("TARS_CONTINUOUS_TAIL_WORKERS", "2")
            ),
        )
        print_stage(f"Continuous batching: {cont_slots} slots", "complete")

    def _segments(text):
        pieces = engine.tokenizer.tokenize(text)
        segs = engine.tokenizer.split_segments(
            pieces, engine.cfg.runtime.max_text_tokens_per_segment
        )
        return [
            np.asarray(engine.tokenizer.convert_tokens_to_ids(s), np.int32)
            for s in segs
        ]

    def _fallback_segments(text, quick=0):
        """No tokenizer (random-weights smoke mode): bytes -> ids, split to
        the same per-segment cap the real tokenizer honors; quick>0 mirrors
        quick_streaming_tokens (small first segments until `quick` tokens)."""
        from indextts_tpu.frontend.tokenizer import byte_fallback_ids

        ids = byte_fallback_ids(text, engine.cfg.gpt.number_text_tokens,
                                max_bytes=200)
        cap = max(1, min(engine.cfg.runtime.max_text_tokens_per_segment,
                         engine.cfg.gpt.max_text_tokens))
        out = []
        i = 0
        while True:
            # quick never EXCEEDS the per-segment cap (the real tokenizer
            # honors the cap regardless; quick only makes segments smaller)
            step = min(quick, cap) if (quick > 0 and i < quick) else cap
            out.append(ids[i:i + step])
            i += step
            if i >= len(ids):
                break
        return out

    def synth(text="", spk_audio=None, emo_audio=None, emo_alpha=1.0,
              emo_vector=None, seed=None, use_emo_text=False, emo_text=None,
              **kw):
        spk = spk_audio or default_prompt
        if spk is None:
            raise ValueError("no speaker prompt: pass spk_audio or set TARS_REFERENCE_AUDIO")
        if service is not None and engine.tokenizer is not None:
            emo_vector = _emo_kwargs(text, use_emo_text, emo_text, emo_vector)
            return engine.infer_continuous(
                service, spk, _segments(text), emo_audio=emo_audio,
                emo_alpha=emo_alpha, emo_vector=emo_vector, seed=seed,
            )
        if engine.tokenizer is not None:
            return engine.infer_text(
                spk, text, emo_audio=emo_audio, emo_alpha=emo_alpha,
                emo_vector=emo_vector, seed=seed,
                use_emo_text=use_emo_text, emo_text=emo_text,
            )
        emo_vector = _emo_kwargs(text, use_emo_text, emo_text, emo_vector)
        seg_ids = _fallback_segments(text)
        if service is not None:
            return engine.infer_continuous(
                service, spk, seg_ids, emo_audio=emo_audio,
                emo_alpha=emo_alpha, emo_vector=emo_vector, seed=seed,
            )
        return engine.infer(spk, seg_ids, emo_audio=emo_audio,
                            emo_alpha=emo_alpha, emo_vector=emo_vector, seed=seed)

    # streaming first-chunk lever (reference: infer_v2.py:573,700): emit
    # small early segments until this many tokens are out, then fall back
    # to the normal per-segment cap; per-request override via the payload's
    # quick_streaming_tokens field
    quick_default = int(os.environ.get("TARS_QUICK_STREAMING", "0"))

    def synth_stream(text="", spk_audio=None, use_emo_text=False,
                     emo_text=None, quick_streaming_tokens=None, **kw):
        spk = spk_audio or default_prompt
        if spk is None:
            raise ValueError("no speaker prompt: pass spk_audio or set TARS_REFERENCE_AUDIO")
        qs = (quick_default if quick_streaming_tokens is None
              else int(quick_streaming_tokens))
        emo_vector = _emo_kwargs(
            text, use_emo_text, emo_text, kw.get("emo_vector")
        )
        if emo_vector is not None:
            kw["emo_vector"] = emo_vector
        if engine.tokenizer is not None:
            pieces = engine.tokenizer.tokenize(text)
            segs = engine.tokenizer.split_segments(
                pieces, engine.cfg.runtime.max_text_tokens_per_segment,
                quick_streaming_tokens=qs,
            )
            seg_ids = [np.asarray(engine.tokenizer.convert_tokens_to_ids(s), np.int32)
                       for s in segs]
        else:
            seg_ids = _fallback_segments(text, quick=qs)
        skw = {
            k: v for k, v in kw.items()
            if k in ("emo_audio", "emo_alpha", "emo_vector", "seed")
        }
        if service is not None:
            # streaming + continuous batching: segments of concurrent
            # streams batch in the shared AR loop, chunks yield in order
            yield from engine.infer_generator_continuous(
                service, spk, seg_ids, **skw
            )
        else:
            yield from engine.infer_generator(spk, seg_ids, **skw)

    # precompile the serving envelope's bucket grid in background threads
    # (decode prompt / latent / s2mel / vocoder programs); requests that
    # arrive meanwhile just block on their own shape's compile as they would
    # have anyway. TARS_PRECOMPILE=0 disables; TARS_PRECOMPILE_CODES bounds
    # the covered code length (default 512 ~= 20 s of audio per segment).
    # Started BEFORE the warmup synthesis: the grid (which includes the
    # warmup's own shapes) compiles on 4 threads while warmup traces, so
    # serving readiness rides the parallel compiles instead of one serial
    # first-infer (engine warmup was the cold-start pole, VERDICT r4 #4).
    if (
        os.environ.get("TARS_PRECOMPILE", "1") == "1"
        and default_prompt
    ):
        import threading

        def _precompile():
            t1 = time.perf_counter()
            try:
                from indextts_tpu.utils import audio as audio_utils

                wav, sr = audio_utils.load_wav(default_prompt)
                spk = engine.prepare_speaker(wav, sr, cache_key=default_prompt)
                n = engine.precompile(
                    spk,
                    max_code_len=int(
                        os.environ.get("TARS_PRECOMPILE_CODES", "512")
                    ),
                    workers=int(os.environ.get("TARS_PRECOMPILE_WORKERS", "4")),
                    # continuous mode decodes through the batcher's own
                    # programs — warm only the cascade-tail grid there
                    decode_variants="none" if service is not None else "both",
                )
                print_stage(
                    f"Precompiled {n} programs", "complete",
                    time.perf_counter() - t1,
                )
            except Exception as e:
                print_stage("Precompile failed", "failed", message_extra=str(e))

        threading.Thread(target=_precompile, daemon=True,
                         name="tars-precompile").start()

    if settings.warmup and default_prompt:
        print_stage("Warmup synthesis", "progress")
        t0 = time.perf_counter()
        try:
            synth(text="warmup")
            print_stage("Warmup done", "complete", time.perf_counter() - t0)
        except Exception as e:
            print_stage("Warmup failed", "failed", message_extra=str(e))

    server = TTSServer(synth, settings, stream_fn=synth_stream)
    GracefulShutdown().install()
    print_stage(f"Serving on {args.host}:{args.port}", "complete")
    server.run()


if __name__ == "__main__":
    main()
