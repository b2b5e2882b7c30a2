#!/usr/bin/env python
"""Voice-conditioning preparation: select + concatenate the best prompt clips,
and precompute the engine's speaker-conditioning bundle.

Parity targets: tools/prepare_voice_conditioning_audio.py (clip quality
scoring, selection, concatenation with fades) and
tools/make_voice_conditioning_tts.py (precomputed voice-conditioning
artifact — theirs emits Moshi embedding safetensors; ours emits the
IndexTTS2Engine SpeakerConditioning tensors as an .npz that serving can load
without re-running the conditioning stack).

  python tools/voice_conditioning.py prepare --input-dir clips/ \
      --output combined.wav --target-duration 12
  python tools/voice_conditioning.py precompute --audio combined.wav \
      --output spk.npz [--model-dir checkpoints]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from indextts_tpu.utils.audio import load_wav, resample, save_wav  # noqa: E402


def quality_score(audio: np.ndarray, sr: int) -> dict:
    """Simple quality metrics (prepare_voice_conditioning_audio.py:22-60):
    peak, rms, crest factor, silence ratio -> one scalar score."""
    peak = float(np.abs(audio).max()) if audio.size else 0.0
    rms = float(np.sqrt(np.mean(audio ** 2))) if audio.size else 0.0
    crest = peak / rms if rms > 0 else 0.0
    silence_threshold = 10 ** (-60 / 20)
    silence_ratio = float(np.mean(np.abs(audio) < silence_threshold)) if audio.size else 1.0
    # prefer loud, low-silence, moderately compressed clips; clipped audio
    # (peak ~1.0) is penalized
    score = rms * (1.0 - silence_ratio)
    if peak > 0.99:
        score *= 0.5
    if crest > 12.0:
        score *= 0.8
    return {
        "peak": peak,
        "rms": rms,
        "crest": crest,
        "silence_ratio": silence_ratio,
        "score": score,
    }


def normalize_peak(audio: np.ndarray, peak_db: float = -1.0) -> np.ndarray:
    """Peak-normalize to peak_db dBFS (make_voice_conditioning_tts.py:22-36)."""
    target = 10 ** (peak_db / 20)
    peak = np.abs(audio).max()
    if peak > 0:
        audio = audio * (target / peak)
    return audio.astype(np.float32)


def cmd_prepare(args):
    in_dir = Path(args.input_dir)
    wavs = sorted(in_dir.glob("*.wav"))
    if not wavs:
        print(f"no wav files under {in_dir}", file=sys.stderr)
        return 1
    scored = []
    for p in wavs:
        audio, sr = load_wav(str(p), target_sr=args.sample_rate)
        scored.append((quality_score(audio, args.sample_rate), p, audio))
    scored.sort(key=lambda t: -t[0]["score"])

    picked, total = [], 0.0
    fade = int(args.sample_rate * args.fade_ms / 1000)
    for q, p, audio in scored:
        if total >= args.target_duration:
            break
        picked.append((p, audio, q))
        total += len(audio) / args.sample_rate

    pieces = []
    for _, audio, _ in picked:
        a = audio.copy()
        if fade and len(a) > 2 * fade:
            ramp = np.linspace(0.0, 1.0, fade, dtype=np.float32)
            a[:fade] *= ramp
            a[-fade:] *= ramp[::-1]
        pieces.append(a)
    combined = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
    limit = int(args.target_duration * args.sample_rate)
    combined = normalize_peak(combined[:limit], args.peak_db)
    save_wav(args.output, combined, args.sample_rate)
    report = {
        "output": args.output,
        "duration_s": round(len(combined) / args.sample_rate, 2),
        "clips": [
            {"path": str(p), **{k: round(v, 4) for k, v in q.items()}}
            for p, _, q in picked
        ],
    }
    print(json.dumps(report, indent=2))
    return 0


def cmd_precompute(args):
    import jax

    from indextts_tpu.config import load_config
    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params

    if args.model_dir:
        from indextts_tpu.runtime.loader import load_engine

        engine = load_engine(args.model_dir)
    else:
        cfg = load_config(args.cfg)
        engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    audio, sr = load_wav(args.audio)
    spk = engine.prepare_speaker(audio, sr)
    np.savez(
        args.output,
        spk_cond_emb=np.asarray(spk.spk_cond_emb),
        cond_len=np.asarray(spk.cond_len),
        style=np.asarray(spk.style),
        prompt_condition=np.asarray(spk.prompt_condition),
        ref_mel=np.asarray(spk.ref_mel),
        ref_mel_len=np.asarray(spk.ref_mel_len),
        spk_latents=np.asarray(spk.spk_latents),
    )
    print(f"wrote {args.output}: cond_len={spk.cond_len} "
          f"ref_mel_len={spk.ref_mel_len}")
    return 0


def load_precomputed_speaker(path: str):
    """Load an .npz written by `precompute` back into a SpeakerConditioning."""
    import jax.numpy as jnp

    from indextts_tpu.runtime.engine import SpeakerConditioning

    z = np.load(path)
    return SpeakerConditioning(
        spk_cond_emb=jnp.asarray(z["spk_cond_emb"]),
        cond_len=int(z["cond_len"]),
        style=jnp.asarray(z["style"]),
        prompt_condition=jnp.asarray(z["prompt_condition"]),
        ref_mel=jnp.asarray(z["ref_mel"]),
        ref_mel_len=int(z["ref_mel_len"]),
        spk_latents=jnp.asarray(z["spk_latents"]),
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="voice_conditioning")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prepare", help="select + concatenate prompt clips")
    pp.add_argument("--input-dir", required=True)
    pp.add_argument("--output", required=True)
    pp.add_argument("--target-duration", type=float, default=12.0)
    pp.add_argument("--sample-rate", type=int, default=16000)
    pp.add_argument("--fade-ms", type=float, default=10.0)
    pp.add_argument("--peak-db", type=float, default=-1.0)
    pp.set_defaults(fn=cmd_prepare)

    pc = sub.add_parser("precompute", help="precompute speaker conditioning")
    pc.add_argument("--audio", required=True)
    pc.add_argument("--output", required=True)
    pc.add_argument("--model-dir", default=None)
    pc.add_argument("--cfg", default=None)
    pc.set_defaults(fn=cmd_precompute)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
