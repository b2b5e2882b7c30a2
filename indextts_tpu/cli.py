"""Command-line synthesis (reference: indextts/cli.py).

Usage:
  python -m indextts_tpu.cli "text to speak" -v voice.wav -o out.wav \
      [--model-dir checkpoints] [--emo-audio emo.wav] [--emo-alpha 0.8] \
      [--emo-vector 0,0,1,0,0,0,0,0] [--seed 0]

With no --model-dir (or a dir without checkpoints), runs with random weights
(audible output is noise — useful only for smoke testing the pipeline).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="indextts-tpu", description=__doc__)
    p.add_argument("text", help="text to synthesize")
    p.add_argument("-v", "--voice", required=True, help="speaker prompt wav")
    p.add_argument("-o", "--output", default="gen.wav", help="output wav path")
    p.add_argument("--model-dir", default=None, help="checkpoint directory")
    p.add_argument("--cfg", default=None, help="config.yaml path")
    p.add_argument("--emo-audio", default=None)
    p.add_argument("--emo-alpha", type=float, default=1.0)
    p.add_argument("--emo-vector", default=None, help="8 comma-separated floats")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-text-tokens-per-segment", type=int, default=120)
    args = p.parse_args(argv)

    from indextts_tpu.config import load_config
    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params
    from indextts_tpu.runtime.loader import load_engine

    if args.model_dir:
        engine = load_engine(args.model_dir, cfg_path=args.cfg)
    else:
        print(">> no --model-dir: random weights (smoke-test mode)", file=sys.stderr)
        cfg = load_config(args.cfg)
        engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))

    emo_vector = None
    if args.emo_vector:
        emo_vector = [float(x) for x in args.emo_vector.split(",")]
        emo_vector = engine.normalize_emo_vec(emo_vector)

    if engine.tokenizer is not None:
        out = engine.infer_text(
            args.voice,
            args.text,
            emo_audio=args.emo_audio,
            emo_alpha=args.emo_alpha,
            emo_vector=emo_vector,
            output_path=args.output,
            seed=args.seed,
            max_text_tokens_per_segment=args.max_text_tokens_per_segment,
        )
    else:
        # no tokenizer available: bytes of the text as a toy id sequence
        import numpy as np

        ids = np.frombuffer(args.text.encode()[:100], dtype=np.uint8).astype(np.int32)
        ids = ids % max(2, engine.cfg.gpt.number_text_tokens - 2) + 2
        out = engine.infer(
            args.voice,
            [ids],
            emo_audio=args.emo_audio,
            emo_alpha=args.emo_alpha,
            emo_vector=emo_vector,
            output_path=args.output,
            seed=args.seed,
        )
    print(
        f">> wrote {args.output}: {out['duration_sec']:.2f}s audio, RTF {out['rtf']:.3f}"
    )


if __name__ == "__main__":
    main()
