"""Observability: staged logging, request boxes, HBM tracking, graceful
shutdown, and per-stage profilers.

Parity target: indextts/logging.py (setup_logging :78, print_stage :52,
print_request_start/complete :197-249, GracefulShutdown :252-297) and
utils/vram_utils.py (VRAMTracker :129-177, VRAMProfiler :93-126) — the VRAM
surface becomes HBM via jax device memory_stats; jax.profiler hooks replace
torch's absent tracing (SURVEY §5 tracing plan).
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import signal
import sys
import time
from contextlib import contextmanager
from typing import Callable, Dict, List, Optional

_LOGGER: Optional[logging.Logger] = None

ANSI = {
    "reset": "\033[0m", "bold": "\033[1m", "green": "\033[32m",
    "yellow": "\033[33m", "red": "\033[31m", "cyan": "\033[36m",
}


def setup_logging(
    name: str = "indextts_tpu",
    log_dir: str = "logs",
    level: int = logging.INFO,
    file_logging: bool = True,
) -> logging.Logger:
    """Console + 10 MB rotating file logger (logging.py:78-120)."""
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger(name)
    logger.setLevel(level)
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(sh)
    if file_logging:
        try:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.handlers.RotatingFileHandler(
                os.path.join(log_dir, f"{name}.log"),
                maxBytes=10 * 1024 * 1024,
                backupCount=3,
            )
            fh.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            )
            logger.addHandler(fh)
        except OSError:
            pass
    _LOGGER = logger
    return logger


def get_logger() -> logging.Logger:
    return _LOGGER or setup_logging()


def print_stage(
    message: str,
    status: str = "progress",
    elapsed: Optional[float] = None,
    message_extra: str = "",
):
    """Stage banner lines (logging.py:52-75)."""
    icon = {"progress": "…", "complete": "✓", "failed": "✗"}.get(status, "•")
    color = {"progress": "cyan", "complete": "green", "failed": "red"}.get(
        status, "reset"
    )
    t = f" ({elapsed:.2f}s)" if elapsed is not None else ""
    extra = f" — {message_extra}" if message_extra else ""
    get_logger().info(f"{ANSI[color]}{icon}{ANSI['reset']} {message}{t}{extra}")


def print_request_box(
    request_id: str,
    text_preview: str,
    duration: Optional[float] = None,
    audio_len: Optional[float] = None,
    rtf: Optional[float] = None,
    done: bool = False,
):
    """Request start/complete boxes (logging.py:197-249)."""
    log = get_logger()
    head = "REQUEST COMPLETE" if done else "REQUEST START"
    lines = [f"┌─ {head} [{request_id}] " + "─" * 20]
    lines.append(f"│ text: {text_preview[:60]!r}")
    if done:
        if duration is not None:
            lines.append(f"│ wall: {duration:.2f}s")
        if audio_len is not None:
            lines.append(f"│ audio: {audio_len:.2f}s")
        if rtf is not None:
            lines.append(f"│ rtf: {rtf:.3f}")
    lines.append("└" + "─" * 40)
    for ln in lines:
        log.info(ln)


# ---------------------------------------------------------------------------
# HBM tracking (vram_utils.py VRAMTracker/VRAMProfiler, TPU edition)
# ---------------------------------------------------------------------------


def get_hbm_usage() -> Dict[str, float]:
    """Bytes in use / limit for the first accelerator device, in GB.

    Backends without allocator stats (the axon-tunneled TPU returns no
    memory_stats) fall back to summing the process's live jax.Arrays on
    that device — client-side tracking that exists on every backend. The
    fallback misses allocator-internal scratch but sees every *held*
    buffer, which is exactly what a leak gate needs (a leaked array is a
    live array); `source` records which gauge produced the number."""
    import jax

    try:
        dev = jax.devices()[0]
    except Exception:
        return {}
    out: Dict[str, float] = {}
    try:
        stats = dev.memory_stats()
    except Exception:
        stats = None
    if stats:
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                out[k.replace("bytes", "gb")] = stats[k] / 1e9
        out["source"] = "memory_stats"
        return out
    try:
        total = 0
        for a in jax.live_arrays():
            try:
                if dev in a.devices():
                    total += a.nbytes
            except Exception:
                continue
        out["gb_in_use"] = total / 1e9
        out["source"] = "live_arrays"
    except Exception:
        return {}
    return out


class HBMTracker:
    """Snapshot HBM usage per model load (VRAMTracker :129-177)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.snapshots: List[Dict] = []

    def snapshot(self, tag: str, model_name: str = ""):
        if not self.enabled:
            return
        u = get_hbm_usage()
        self.snapshots.append({"tag": tag, "model": model_name, **u})
        if u:
            get_logger().info(
                f"[hbm] {tag}: in_use={u.get('gb_in_use', 0):.2f}GB "
                f"peak={u.get('peak_gb_in_use', 0):.2f}GB"
            )

    def report(self) -> List[Dict]:
        return list(self.snapshots)


@contextmanager
def hbm_profile(tag: str):
    """Block profiler (VRAMProfiler :93-126)."""
    before = get_hbm_usage()
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    after = get_hbm_usage()
    delta = after.get("gb_in_use", 0) - before.get("gb_in_use", 0)
    get_logger().info(f"[hbm] {tag}: {dt:.2f}s, Δ{delta:+.2f}GB")


class StageTimers:
    """Accumulating wall-clock stage timers (infer_v2.py:726-729 pattern)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextmanager
    def track(self, stage: str):
        t0 = time.perf_counter()
        yield
        self.totals[stage] = self.totals.get(stage, 0.0) + time.perf_counter() - t0

    def report(self) -> Dict[str, float]:
        return dict(self.totals)


class GracefulShutdown:
    """SIGINT/SIGTERM two-stage shutdown (logging.py:252-297)."""

    def __init__(self):
        self.requested = False
        self._callbacks: List[Callable[[], None]] = []
        self._orig = {}

    def register(self, cb: Callable[[], None]):
        self._callbacks.append(cb)

    def install(self):
        try:
            for sig in (signal.SIGINT, signal.SIGTERM):
                self._orig[sig] = signal.signal(sig, self._handler)
        except ValueError:
            # signal handlers can only be set on the main thread; embedded
            # servers (benchmarks, tests) run serve.main on a worker thread
            # and handle shutdown themselves
            get_logger().info("GracefulShutdown: not on main thread; skipped")
        return self

    def _handler(self, signum, frame):
        if self.requested:
            get_logger().warning("forced shutdown")
            raise SystemExit(130)
        self.requested = True
        get_logger().info("shutdown requested; finishing in-flight work "
                          "(signal again to force)")
        for cb in self._callbacks:
            try:
                cb()
            except Exception:
                pass


@contextmanager
def jax_trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (SURVEY §5 TPU tracing plan)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
