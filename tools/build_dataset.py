#!/usr/bin/env python
"""Parallel TTS corpus builder.

Parity target: tools/build_moshi_dataset_with_indexts.py (1863 LoC) —
multi-worker synthesis over a JSONL manifest with:
  * thread backend: one shared engine + accelerator semaphore
    (--max-accelerator-concurrency; reference --max-gpu-concurrency)
  * process backend: isolated engine per worker (separate devices/hosts)
  * --mock-inference: deterministic synthetic audio from the text hash,
    no models loaded (reference :177-188) — for pipeline/throughput testing
  * deterministic seeding (--deterministic --seed N, reference :437-464)
  * resume: completed utterance ids in existing manifests are skipped
    (reference tools/create_resume_jsonl.py workflow)
  * thread-safe manifest flushing

Input JSONL rows: {"id": str, "text": str, optional "spk_audio": str,
"emo_vector": [8 floats], "emo_audio": str}.
Output: out_dir/wavs/<id>.wav + out_dir/manifest.jsonl rows
{"id", "text", "wav", "duration_sec", "worker", "elapsed_s"}.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import queue
import sys
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


@dataclass
class SynthesisTask:
    uid: str
    text: str
    spk_audio: Optional[str] = None
    emo_vector: Optional[List[float]] = None
    emo_audio: Optional[str] = None


@dataclass
class PipelineConfig:
    input_jsonl: str
    out_dir: str
    workers: int = 1
    backend: str = "thread"  # thread | process
    mock_inference: bool = False
    deterministic: bool = False
    seed: int = 0
    max_accel_concurrency: int = 1
    model_dir: Optional[str] = None
    default_spk_audio: Optional[str] = None
    sample_rate: int = 22050


def mock_synthesize(text: str, sample_rate: int = 22050) -> np.ndarray:
    """Deterministic sine-ish audio from the text hash (reference :177-188)."""
    h = hashlib.sha256(text.encode()).digest()
    dur = 0.5 + (h[0] / 255.0) * 2.0  # 0.5 - 2.5 s
    freq = 120.0 + h[1] * 3.0
    t = np.arange(int(dur * sample_rate)) / sample_rate
    w = 0.2 * np.sin(2 * np.pi * freq * t) * np.exp(-0.5 * t)
    return w.astype(np.float32)


def load_tasks(path: str) -> List[SynthesisTask]:
    tasks = []
    for i, line in enumerate(open(path)):
        line = line.strip()
        if not line:
            continue
        row = json.loads(line)
        tasks.append(
            SynthesisTask(
                uid=str(row.get("id", i)),
                text=row["text"],
                spk_audio=row.get("spk_audio"),
                emo_vector=row.get("emo_vector"),
                emo_audio=row.get("emo_audio"),
            )
        )
    return tasks


def load_completed(manifest_path: Path) -> set:
    done = set()
    if manifest_path.exists():
        for line in open(manifest_path):
            try:
                done.add(json.loads(line)["id"])
            except (json.JSONDecodeError, KeyError):
                continue
    return done


class ManifestWriter:
    """Thread-safe append-and-flush manifest (reference _common_flush_manifest)."""

    def __init__(self, path: Path):
        self.path = path
        self.lock = threading.Lock()
        self.f = open(path, "a")

    def write(self, row: Dict):
        with self.lock:
            self.f.write(json.dumps(row, ensure_ascii=False) + "\n")
            self.f.flush()

    def close(self):
        with self.lock:
            self.f.close()


def _make_engine(cfg: PipelineConfig):
    if cfg.mock_inference:
        return None
    if cfg.model_dir:
        from indextts_tpu.runtime.loader import load_engine

        return load_engine(cfg.model_dir)
    from indextts_tpu.config import load_config
    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params

    c = load_config()
    return IndexTTS2Engine(c, random_params(c, seed=0))


def _task_seed(cfg: PipelineConfig, task: SynthesisTask) -> Optional[int]:
    if not cfg.deterministic:
        return None
    h = hashlib.sha256(f"{cfg.seed}:{task.uid}".encode()).digest()
    return int.from_bytes(h[:4], "little")


def _synthesize(engine, cfg: PipelineConfig, task: SynthesisTask,
                accel_sem: Optional[threading.Semaphore]) -> np.ndarray:
    if cfg.mock_inference:
        return mock_synthesize(task.text, cfg.sample_rate)
    spk = task.spk_audio or cfg.default_spk_audio
    if spk is None:
        raise ValueError(f"task {task.uid}: no speaker audio")
    kwargs = {}
    if task.emo_vector:
        kwargs["emo_vector"] = engine.normalize_emo_vec(task.emo_vector)
    if task.emo_audio:
        kwargs["emo_audio"] = task.emo_audio
    seed = _task_seed(cfg, task)

    def run():
        if engine.tokenizer is not None:
            return engine.infer_text(spk, task.text, seed=seed, **kwargs)
        ids = np.frombuffer(task.text.encode()[:400], dtype=np.uint8).astype(np.int32)
        ids = ids % max(2, engine.cfg.gpt.number_text_tokens - 2) + 2
        return engine.infer(spk, [ids], seed=seed, **kwargs)

    if accel_sem is not None:
        with accel_sem:
            out = run()
    else:
        out = run()
    return out["audio"]


def worker_loop(wid: int, cfg: PipelineConfig, engine, task_q: "queue.Queue",
                manifest: ManifestWriter, accel_sem, wav_dir: Path):
    from indextts_tpu.utils.audio import save_wav

    while True:
        try:
            task = task_q.get_nowait()
        except queue.Empty:
            return
        t0 = time.perf_counter()
        try:
            wav = _synthesize(engine, cfg, task, accel_sem)
            wav_path = wav_dir / f"{task.uid}.wav"
            save_wav(str(wav_path), wav, cfg.sample_rate)
            manifest.write(
                {
                    "id": task.uid,
                    "text": task.text,
                    "wav": str(wav_path),
                    "duration_sec": round(len(wav) / cfg.sample_rate, 3),
                    "worker": wid,
                    "elapsed_s": round(time.perf_counter() - t0, 3),
                }
            )
        except Exception as e:
            manifest.write({"id": task.uid, "error": str(e), "worker": wid})
        finally:
            task_q.task_done()


def run_thread_backend(cfg: PipelineConfig, tasks: List[SynthesisTask]):
    out = Path(cfg.out_dir)
    wav_dir = out / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    manifest = ManifestWriter(out / "manifest.jsonl")
    engine = _make_engine(cfg)
    accel_sem = (
        threading.Semaphore(cfg.max_accel_concurrency)
        if not cfg.mock_inference
        else None
    )
    q: "queue.Queue" = queue.Queue()
    for t in tasks:
        q.put(t)
    threads = [
        threading.Thread(
            target=worker_loop,
            args=(i, cfg, engine, q, manifest, accel_sem, wav_dir),
            daemon=True,
        )
        for i in range(cfg.workers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    manifest.close()


def _process_worker(wid: int, cfg_dict: dict, task_dicts: List[dict]):
    cfg = PipelineConfig(**cfg_dict)
    tasks = [SynthesisTask(**t) for t in task_dicts]
    out = Path(cfg.out_dir)
    wav_dir = out / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    manifest = ManifestWriter(out / f"manifest.worker{wid}.jsonl")
    engine = _make_engine(cfg)
    q: "queue.Queue" = queue.Queue()
    for t in tasks:
        q.put(t)
    worker_loop(wid, cfg, engine, q, manifest, None, wav_dir)
    manifest.close()


def run_process_backend(cfg: PipelineConfig, tasks: List[SynthesisTask]):
    import multiprocessing as mp

    chunks: List[List[SynthesisTask]] = [[] for _ in range(cfg.workers)]
    for i, t in enumerate(tasks):
        chunks[i % cfg.workers].append(t)
    cfg_dict = {k: getattr(cfg, k) for k in cfg.__dataclass_fields__}
    procs = []
    ctx = mp.get_context("spawn")
    for wid, chunk in enumerate(chunks):
        p = ctx.Process(
            target=_process_worker,
            args=(wid, cfg_dict, [t.__dict__ for t in chunk]),
        )
        p.start()
        procs.append(p)
    for p in procs:
        p.join()
    # merge per-worker manifests
    out = Path(cfg.out_dir)
    with open(out / "manifest.jsonl", "a") as f:
        for wid in range(cfg.workers):
            part = out / f"manifest.worker{wid}.jsonl"
            if part.exists():
                f.write(part.read_text())
                part.unlink()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="input JSONL")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--backend", choices=["thread", "process"], default="thread")
    p.add_argument("--mock-inference", action="store_true")
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-accelerator-concurrency", type=int, default=1)
    p.add_argument("--model-dir", default=None)
    p.add_argument("--spk-audio", default=None)
    args = p.parse_args(argv)

    cfg = PipelineConfig(
        input_jsonl=args.input,
        out_dir=args.out_dir,
        workers=args.workers,
        backend=args.backend,
        mock_inference=args.mock_inference,
        deterministic=args.deterministic,
        seed=args.seed,
        max_accel_concurrency=args.max_accelerator_concurrency,
        model_dir=args.model_dir,
        default_spk_audio=args.spk_audio,
    )
    tasks = load_tasks(cfg.input_jsonl)
    done = load_completed(Path(cfg.out_dir) / "manifest.jsonl")
    remaining = [t for t in tasks if t.uid not in done]
    print(
        f">> {len(tasks)} tasks, {len(done)} already complete, "
        f"{len(remaining)} to synthesize ({cfg.backend} x{cfg.workers})",
        file=sys.stderr,
    )
    t0 = time.perf_counter()
    if cfg.backend == "thread":
        run_thread_backend(cfg, remaining)
    else:
        run_process_backend(cfg, remaining)
    wall = time.perf_counter() - t0
    total_audio = 0.0
    for line in open(Path(cfg.out_dir) / "manifest.jsonl"):
        try:
            total_audio += json.loads(line).get("duration_sec", 0.0)
        except json.JSONDecodeError:
            pass
    print(
        json.dumps(
            {"wall_s": round(wall, 2), "audio_s": round(total_audio, 2),
             "workers": cfg.workers, "backend": cfg.backend}
        )
    )


if __name__ == "__main__":
    main()
