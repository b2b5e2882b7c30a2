"""Training step for UnifiedVoice: teacher-forced text+mel cross-entropy.

The reference ships no training loop (inference-only checkpoints, SURVEY §5);
this provides the standard AR-TTS objective implied by its dual heads
(model_v2.py:597-625) so the framework can fine-tune / train, and so the
multi-chip dry-run exercises a real sharded forward+backward.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

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
