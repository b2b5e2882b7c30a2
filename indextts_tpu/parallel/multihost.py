"""Multi-host (multi-process) runtime initialization.

The scaling target (BASELINE.md: >=85% efficiency at 2 hosts) is DP over
hosts on the `data` mesh axis + TP over ICI on the `model` axis. JAX needs
`jax.distributed.initialize` called once per process before any device use;
on Cloud TPU pods the coordinator/process topology is auto-detected from the
TPU metadata, elsewhere it comes from the standard envs.

This module is the single entry point for that: call
`maybe_initialize_distributed()` first thing in any multi-host launcher
(serve.py / tools). It is a strict no-op when the job is single-process, so
every code path stays correct on one chip or the CPU test mesh.

Env contract (mirrors jax.distributed's own):
  TARS_COORDINATOR  host:port of process 0 (alias: JAX_COORDINATOR_ADDRESS)
  TARS_NUM_PROCESSES / TARS_PROCESS_ID   explicit topology (aliases:
      JAX_NUM_PROCESSES / JAX_PROCESS_ID)

On TPU pods where the runtime already exposes the topology, calling with no
envs set still works: jax.distributed.initialize() auto-detects. We only
skip it when there is provably a single process (no envs, no TPU pod).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("indextts_tpu.multihost")

_INITIALIZED = False


def _env(*names: str) -> str | None:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed if this looks like a multi-process job.

    Returns True if initialize() was called (or already had been), False for
    the single-process fast path. Safe to call multiple times.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coord = _env("TARS_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
    nproc = _env("TARS_NUM_PROCESSES", "JAX_NUM_PROCESSES")
    pid = _env("TARS_PROCESS_ID", "JAX_PROCESS_ID")

    if coord is None and nproc is None:
        # single-process job (the common case in this sandbox); nothing to do
        return False
    if nproc is not None and int(nproc) <= 1:
        return False

    import jax

    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def global_mesh(model: int = 1, devices=None):
    """Build the (data, model) mesh over ALL global devices: data axis spans
    hosts (DCN), model axis stays inside a host's ICI domain.

    `model` must divide the per-host device count so TP collectives never
    cross DCN (the scaling-book rule: psum-heavy axes ride ICI)."""
    import jax

    from indextts_tpu.parallel.sharding import make_mesh

    if devices is None:
        devices = jax.devices()
    local = jax.local_device_count()
    assert local % model == 0, (
        f"model={model} must divide the per-host device count {local} "
        "so TP collectives stay on ICI"
    )
    data = len(devices) // model
    return make_mesh(data=data, model=model, devices=devices)
