#!/usr/bin/env python
"""Environment diagnostic (reference: tools/gpu_check.py, TPU edition).

Prints JAX/device/library status and runs a tiny compute sanity check."""

from __future__ import annotations

import json
import sys


def main():
    out = {}
    try:
        import jax
        import jax.numpy as jnp

        out["jax"] = jax.__version__
        devs = jax.devices()
        out["devices"] = [str(d) for d in devs]
        out["default_backend"] = jax.default_backend()
        x = jnp.ones((128, 128))
        y = float((x @ x).sum())
        out["matmul_check"] = "ok" if y == 128.0 * 128 * 128 else f"BAD ({y})"
        try:
            stats = devs[0].memory_stats() or {}
            out["hbm_limit_gb"] = round(stats.get("bytes_limit", 0) / 1e9, 2)
        except Exception:
            pass
    except Exception as e:
        out["jax_error"] = str(e)

    for mod in ("flax", "optax", "orbax.checkpoint", "numpy", "scipy", "transformers"):
        try:
            m = __import__(mod)
            out[mod] = getattr(m, "__version__", "present")
        except ImportError:
            out[mod] = None

    try:
        from indextts_tpu.utils import native

        out["native_dsp"] = native.available()
    except Exception as e:
        out["native_dsp"] = f"error: {e}"

    print(json.dumps(out, indent=2))
    ok = "jax_error" not in out and out.get("matmul_check") == "ok"
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
