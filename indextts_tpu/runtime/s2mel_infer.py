"""Jitted CFM inference: the 20-step Euler ODE solve with batched CFG.

Parity target: BASECFM.inference / solve_euler
(s2mel/modules/flow_matching.py:30-115): uniform t grid, classifier-free
guidance by stacking (cond, null) into one 2B batch per step, prompt mel
frames pinned to zero in the state and re-injected via prompt_x.

The whole solve is one XLA program (`lax.fori_loop`); the estimator is the
DiT, so each step is 13 dense attention blocks on a 2B batch — MXU-bound.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from indextts_tpu.models.s2mel import S2Mel


@functools.partial(
    jax.jit, static_argnames=("model", "n_steps", "dtype")
)
def cfm_inference(
    model: S2Mel,
    params,
    mu: jnp.ndarray,  # (B, T, 512) semantic condition (prompt+target)
    x_lens: jnp.ndarray,  # (B,) valid total frames
    prompt_x: jnp.ndarray,  # (B, 80, T) ref mel in [:, :, :prompt_len], zeros after
    prompt_len: jnp.ndarray,  # scalar int
    style: jnp.ndarray,  # (B, 192)
    noise: jnp.ndarray,  # (B, 80, T) ~ N(0,1) * temperature
    n_steps: int = 20,
    cfg_rate: float = 0.7,
    dtype: Any = jnp.float32,
):
    """dtype: DiT estimator compute dtype (config.runtime.s2mel_dtype). The
    Euler state x, the CFG combine and the update stay fp32; only the
    estimator inputs/outputs are cast — norm stats and attention softmax
    inside the DiT are fp32 islands regardless."""
    B, C, T = noise.shape
    frame_idx = jnp.arange(T)
    in_prompt = (frame_idx < prompt_len)[None, None, :]  # (1,1,T)

    x = jnp.where(in_prompt, 0.0, noise)
    dt = 1.0 / n_steps

    zeros_prompt = jnp.zeros_like(prompt_x)
    zeros_style = jnp.zeros_like(style)
    zeros_mu = jnp.zeros_like(mu)

    stacked_prompt = jnp.concatenate([prompt_x, zeros_prompt], axis=0).astype(dtype)
    stacked_style = jnp.concatenate([style, zeros_style], axis=0).astype(dtype)
    stacked_mu = jnp.concatenate([mu, zeros_mu], axis=0).astype(dtype)
    # per-seq lengths must cover the CFG-stacked 2B batch (the reference
    # relies on B=1 broadcasting, flow_matching.py:96-98)
    stacked_lens = (
        jnp.concatenate([x_lens, x_lens]) if x_lens.shape[0] == B else x_lens
    )

    def body(step, x):
        t = step.astype(jnp.float32) * dt  # t BEFORE the update (t_span[step-1])
        stacked_x = jnp.concatenate([x, x], axis=0).astype(dtype)
        stacked_t = jnp.full((2 * B,), t, jnp.float32)
        dphi = model.apply(
            params,
            stacked_x,
            stacked_prompt,
            stacked_lens,
            stacked_t,
            stacked_style,
            stacked_mu,
            method=S2Mel.velocity,
        ).astype(jnp.float32)
        d_cond, d_null = jnp.split(dphi, 2, axis=0)
        d = (1.0 + cfg_rate) * d_cond - cfg_rate * d_null
        x = x + dt * d
        return jnp.where(in_prompt, 0.0, x)

    x = jax.lax.fori_loop(0, n_steps, body, x)
    return x


@functools.partial(jax.jit, static_argnames=("model", "out_len"))
def length_regulate(model: S2Mel, params, x, ylens, out_len: int, xlens=None):
    return model.apply(params, x, ylens, out_len, xlens, method=S2Mel.regulate)


@functools.partial(jax.jit, static_argnames=("model",))
def project_gpt_latent(model: S2Mel, params, x):
    return model.apply(params, x, method=S2Mel.project_gpt_latent)
