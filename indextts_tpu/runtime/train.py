"""Training steps: UnifiedVoice AR cross-entropy and s2mel CFM flow-matching.

The reference ships no training loop (inference-only checkpoints, SURVEY §5),
but its modules carry the objectives: the GPT's dual text/mel heads
(model_v2.py:597-625) and the CFM's conditional flow-matching loss
(s2mel/modules/flow_matching.py:116-159). Both are provided here so the
framework can fine-tune / train, and so the multi-chip dry-run exercises a
real sharded forward+backward.

TPU-first notes: the reference's CFM loss masks the prompt window and
averages the error with a per-sample Python loop (flow_matching.py:144-157);
here the same semantics are pure mask arithmetic over static shapes — one
XLA program, grad-able, shardable over the data axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from indextts_tpu.models.s2mel import S2Mel
from indextts_tpu.models.unified_voice import UnifiedVoice


def mel_text_loss(
    model: UnifiedVoice,
    params,
    spk_latents,
    text_ids,
    text_lens,
    mel_codes,
    mel_lens,
    emovec,
) -> jnp.ndarray:
    text_logits, mel_logits, text_tar, mel_tar = model.apply(
        params,
        spk_latents,
        text_ids,
        text_lens,
        mel_codes,
        mel_lens,
        emovec,
        method=UnifiedVoice.forward_train,
    )
    lt = optax.softmax_cross_entropy_with_integer_labels(text_logits, text_tar)
    lm = optax.softmax_cross_entropy_with_integer_labels(mel_logits, mel_tar)
    # loss weighting as in tortoise-style training: mel dominates
    return 0.01 * lt.mean() + lm.mean()


def make_train_step(model: UnifiedVoice, optimizer: optax.GradientTransformation):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, loss).
    Pure function — jit/shard it at the call site with the desired shardings."""

    def train_step(params, opt_state, batch: Dict[str, jnp.ndarray]):
        def loss_fn(p):
            return mel_text_loss(
                model,
                p,
                batch["spk_latents"],
                batch["text_ids"],
                batch["text_lens"],
                batch["mel_codes"],
                batch["mel_lens"],
                batch["emovec"],
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


# ---------------------------------------------------------------------------
# s2mel CFM (conditional flow matching)
# ---------------------------------------------------------------------------


def cfm_loss(
    model: S2Mel,
    params,
    x1: jnp.ndarray,  # (B, 80, T) target mel
    x_lens: jnp.ndarray,  # (B,) valid total frames
    prompt_lens: jnp.ndarray,  # (B,) reference-prompt frames
    mu: jnp.ndarray,  # (B, T, content_dim) semantic condition
    style: jnp.ndarray,  # (B, style_dim)
    t: jnp.ndarray,  # (B,) diffusion times ~ U[0,1]
    z: jnp.ndarray,  # (B, 80, T) noise ~ N(0,1)
    drop_cond: Optional[jnp.ndarray] = None,  # (B,) bool CFG dropout
    sigma_min: float = 1e-6,
    loss_type: str = "l2",
    zero_prompt_speech_token: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conditional flow-matching loss, parity with BASECFM.forward
    (flow_matching.py:116-159): OT path y = (1-(1-σ)t)z + t·x1, target
    velocity u = x1 - (1-σ)z, prompt frames pinned (prompt carries the
    reference mel, the state y is zeroed there), and the error averaged per
    sample over its own (prompt_len, x_len) window — matching the
    reference's per-sample `criterion(...)` then `/b` exactly, but as one
    vectorized masked reduction.

    t and z are explicit inputs (sample them from a PRNG key at the call
    site) so the loss is a pure function — jit/grad/shard it freely.
    Returns (loss, y_flow) where y_flow = estimator_out + (1-σ)·z, the
    reference's second return."""
    B, C, T = x1.shape
    frame = jnp.arange(T)[None, :]
    in_prompt = frame < prompt_lens[:, None]  # (B, T)
    valid = frame < x_lens[:, None]  # (B, T)

    t3 = t[:, None, None].astype(x1.dtype)
    y = (1.0 - (1.0 - sigma_min) * t3) * z + t3 * x1
    u = x1 - (1.0 - sigma_min) * z

    prompt = jnp.where(in_prompt[:, None, :], x1, 0.0)
    y = jnp.where(in_prompt[:, None, :], 0.0, y)
    mu_in = jnp.where(in_prompt[:, :, None], 0.0, mu) if zero_prompt_speech_token else mu

    est = model.apply(
        params, y, prompt, x_lens, t, style, mu_in, drop_cond,
        method=S2Mel.velocity,
    )

    win = (valid & ~in_prompt)[:, None, :]  # (B, 1, T)
    diff = jnp.where(win, (est - u).astype(jnp.float32), 0.0)
    per_elem = jnp.square(diff) if loss_type == "l2" else jnp.abs(diff)
    n_b = jnp.maximum(win.sum(axis=(1, 2)) * C, 1).astype(jnp.float32)  # elems/sample
    loss_b = per_elem.sum(axis=(1, 2)) / n_b
    return loss_b.mean(), est + (1.0 - sigma_min) * z


def make_cfm_train_step(
    model: S2Mel,
    optimizer: optax.GradientTransformation,
    class_dropout_prob: float = 0.1,
    sigma_min: float = 1e-6,
    loss_type: str = "l2",
    zero_prompt_speech_token: bool = False,
):
    """Returns train_step(params, opt_state, batch, rng) -> (params,
    opt_state, loss). batch keys: x1, x_lens, prompt_lens, mu, style.
    Per-sample CFG dropout at `class_dropout_prob` (the DiT's training-time
    class dropout, diffusion_transformer.py:202-203). Pure — jit/shard at
    the call site."""

    def train_step(params, opt_state, batch: Dict[str, jnp.ndarray], rng):
        x1 = batch["x1"]
        B = x1.shape[0]
        k_t, k_z, k_d = jax.random.split(rng, 3)
        t = jax.random.uniform(k_t, (B,), jnp.float32)
        z = jax.random.normal(k_z, x1.shape, x1.dtype)
        drop = (
            jax.random.bernoulli(k_d, class_dropout_prob, (B,))
            if class_dropout_prob > 0.0
            else None
        )

        def loss_fn(p):
            loss, _ = cfm_loss(
                model, p, x1, batch["x_lens"], batch["prompt_lens"],
                batch["mu"], batch["style"], t, z, drop,
                sigma_min=sigma_min, loss_type=loss_type,
                zero_prompt_speech_token=zero_prompt_speech_token,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
