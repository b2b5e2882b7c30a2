#!/usr/bin/env python
"""Checkpoint self-test: validate a reference checkpoint directory against
this framework's converters BEFORE committing to a deployment.

No real checkpoints ship with the reference snapshot, so the converters
(`runtime/torch_convert.py`, 4 formats — reference loaders:
utils/checkpoint.py:25, s2mel/modules/commons.py:579, HF safetensors,
hf_hub files) are exercised on synthetic state dicts in tests. This tool is
the moment-of-truth check for a real download:

  1. inventories which checkpoint files are present/missing
     (gpt.pth, s2mel.pth, wav2vec2bert_stats.pt, feat1/feat2.pt, bpe.model,
     hf/{w2v-bert-2.0, semantic_codec.safetensors, campplus_cn_common.bin,
     bigvgan_generator.pt}),
  2. converts them and structurally diffs each converted tree against the
     config-derived expectation (path set + leaf shapes — random_params is
     the schema oracle),
  3. checks the emo/spk matrix layout assumption
     (feat2.pt rows == sum(config emo_num), reference infer_v2.py:281-289),
  4. optionally runs a one-segment synthesis smoke (--synth) and reports
     stage timings + output stats.

Exit code 0 = everything present and structurally sound; 1 = problems
(missing files are warnings unless --strict).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EXPECTED_FILES = [
    "config.yaml", "gpt.pth", "s2mel.pth", "wav2vec2bert_stats.pt",
    "feat1.pt", "feat2.pt", "bpe.model", "hf/w2v-bert-2.0",
    "hf/semantic_codec.safetensors", "hf/campplus_cn_common.bin",
    "hf/bigvgan_generator.pt",
]


def tree_schema(tree, prefix=""):
    """{path: shape} for a nested param dict."""
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(tree_schema(v, p))
        else:
            out[p] = tuple(getattr(v, "shape", ()))
    return out


def diff_schema(want, got):
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    mismatched = sorted(
        p for p in set(want) & set(got) if want[p] != got[p]
    )
    return missing, extra, mismatched


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--synth", action="store_true",
                    help="also run a one-segment synthesis smoke")
    ap.add_argument("--spk-audio", default=None,
                    help="prompt wav for --synth (default: synthetic noise)")
    ap.add_argument("--strict", action="store_true",
                    help="missing checkpoint files are errors, not warnings")
    ap.add_argument("--output", default=None, help="write report JSON here")
    args = ap.parse_args(argv)

    d = Path(args.model_dir)
    report = {"model_dir": str(d), "files": {}, "components": {}, "ok": True}

    for rel in EXPECTED_FILES:
        present = (d / rel).exists()
        report["files"][rel] = "present" if present else "MISSING"
        if not present and args.strict:
            report["ok"] = False

    from indextts_tpu.config import load_config
    from indextts_tpu.runtime.engine import random_params
    from indextts_tpu.runtime.loader import convert_reference_checkpoints

    cfg_path = d / "config.yaml"
    cfg = load_config(str(cfg_path) if cfg_path.exists() else None)
    params, aux = convert_reference_checkpoints(str(d), cfg)
    schema_oracle = random_params(cfg, seed=0)

    for name, oracle_tree in schema_oracle.items():
        if name not in params:
            report["components"][name] = {"status": "not in checkpoint dir"}
            if args.strict:
                report["ok"] = False
            continue
        want = tree_schema(oracle_tree)
        got = tree_schema(params[name])
        missing, extra, mism = diff_schema(want, got)
        n_params = sum(
            int(__import__("numpy").prod(s)) if s else 1 for s in got.values()
        )
        # extra paths are informational only: the converter can carry heads
        # the inference oracle never instantiates (e.g. text_head, used by
        # the training loss but not forward_latent)
        comp = {
            "status": "ok" if not (missing or mism) else "SCHEMA DIFF",
            "leaves": len(got),
            "params": n_params,
        }
        if missing:
            comp["missing_paths"] = missing[:20]
        if extra:
            comp["extra_paths_info"] = extra[:20]
        if mism:
            comp["shape_mismatches"] = [
                f"{p}: want {want[p]} got {got[p]}" for p in mism[:20]
            ]
        if comp["status"] != "ok":
            report["ok"] = False
        report["components"][name] = comp

    # emotion/speaker matrix layout (feat2/feat1, infer_v2.py:281-289):
    # rows must equal sum(emo_num) so the per-group split is valid
    n_expected = sum(cfg.emo_num)
    for key, dim in (("emo_matrix", cfg.gpt.model_dim), ("spk_matrix", 192)):
        if key in aux:
            shape = tuple(aux[key].shape)
            ok = shape[0] == n_expected and shape[1] == dim
            report["components"][key] = {
                "status": "ok" if ok else "LAYOUT MISMATCH",
                "shape": shape,
                "expected": (n_expected, dim),
            }
            if not ok:
                report["ok"] = False
    if "semantic_stats" in aux:
        m, s = aux["semantic_stats"]
        report["components"]["semantic_stats"] = {
            "status": "ok" if m.shape == s.shape == (cfg.w2vbert.hidden_size,)
            else "SHAPE MISMATCH",
            "mean_shape": tuple(m.shape), "std_shape": tuple(s.shape),
        }

    if args.synth:
        import time

        import numpy as np

        from indextts_tpu.runtime.loader import load_engine
        from indextts_tpu.utils.audio import load_wav

        engine = load_engine(str(d))
        if args.spk_audio:
            wav, sr = load_wav(args.spk_audio)
        else:
            sr = 16000
            wav = (np.random.default_rng(0).standard_normal(3 * sr) * 0.1
                   ).astype(np.float32)
        t0 = time.perf_counter()
        if engine.tokenizer is not None:
            out = engine.infer_text((wav, sr), "Checkpoint self test.", seed=0)
        else:
            ids = np.arange(2, 10, dtype=np.int32)
            out = engine.infer((wav, sr), [ids], seed=0)
        audio = np.asarray(out["audio"])
        report["synth"] = {
            "wall_s": round(time.perf_counter() - t0, 2),
            "audio_s": round(out["duration_sec"], 3),
            "finite": bool(np.isfinite(audio).all()),
            "peak": round(float(np.abs(audio).max()), 4),
        }
        if not report["synth"]["finite"]:
            report["ok"] = False

    text = json.dumps(report, indent=2)
    print(text)
    if args.output:
        Path(args.output).write_text(text + "\n")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
