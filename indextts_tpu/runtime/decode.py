"""Fully-jitted autoregressive decode loop for UnifiedVoice.

Replaces the reference's two decode paths with one XLA program:
  * HF GenerationMixin sampling (vendored transformers_generation_utils) and
  * the accel engine's CUDA-graph decode (accel/accel_engine.py:378-645)
whose per-token host bookkeeping (block tables, slot mappings,
accel_engine.py:154-212) becomes on-device index arithmetic inside a
`lax.while_loop`. Graph capture is free under jit; continuous batching is a
batch dimension plus per-sequence finished flags.

Sampling parity: HF processor order — repetition penalty -> temperature ->
top-k -> top-p -> categorical (generation_utils semantics, including the
quirk that the left-padded fake input ids {1, start_mel_token} participate in
the repetition penalty).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import GPTConfig
from indextts_tpu.models.unified_voice import UnifiedVoice

NEG_INF = -1e9


@dataclass(frozen=True)
class SamplingConfig:
    """Static sampling configuration (hashable; changing it recompiles)."""

    do_sample: bool = True
    top_k: int = 30
    use_repetition_penalty: bool = True
    # include the HF fake-prompt tokens {1, start_mel} in the penalty set,
    # replicating reference generate() over fake_inputs (model_v2.py:785-794)
    hf_fake_prompt_penalty: bool = True
    # benchmarking: never emit the stop token, so generation length is exactly
    # max_new (deterministic work regardless of weights)
    ban_stop_token: bool = False
    # typical sampling (inference_speech typical_sampling flag,
    # model_v2.py:858-866); applied after the repetition penalty
    use_typical_sampling: bool = False
    typical_mass: float = 0.9


@dataclass
class GenerateResult:
    codes: jnp.ndarray  # (B, max_new) int32, stop-token padded
    lengths: jnp.ndarray  # (B,) int32 — generated length INCLUDING stop token


def _apply_top_k_top_p_sample(
    logits: jnp.ndarray,
    key: jnp.ndarray,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: int,
) -> jnp.ndarray:
    """HF warper chain: temperature -> top-k -> top-p -> categorical.

    Operates on the top-k subset only (k << vocab), everything else is
    filtered anyway; keeps the hot loop off the full 8194-wide softmax sort."""
    B, V = logits.shape
    logits = logits / temperature
    vals, idx = jax.lax.top_k(logits, top_k)  # (B, k) descending
    # top-p on the descending-sorted subset: remove tokens whose cumulative
    # probability (exclusive) >= top_p; always keep the first
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p  # exclusive-cumsum < p
    keep = keep.at[:, 0].set(True)
    vals = jnp.where(keep, vals, NEG_INF)
    choice = jax.random.categorical(key, vals, axis=-1)  # (B,)
    return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]


def _repetition_penalty(
    logits: jnp.ndarray, penal_mask: jnp.ndarray, penalty: jnp.ndarray
) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor: score<0 ? score*p : score/p."""
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(penal_mask, penalized, logits)


def typical_filter(
    scores: jnp.ndarray, mass: float, min_tokens_to_keep: int = 1
) -> jnp.ndarray:
    """Typical sampling warper (utils/typical_sampling.py:4-30 / HF
    TypicalLogitsWarper): keep tokens whose -log p is closest to the
    distribution entropy until `mass` cumulative probability is reached."""
    normalized = jax.nn.log_softmax(scores, axis=-1)
    p = jnp.exp(normalized)
    ent = -jnp.sum(jnp.where(p > 0, normalized * p, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-normalized - ent)
    order = jnp.argsort(shifted, axis=-1)  # ascending
    sorted_shifted = jnp.take_along_axis(shifted, order, axis=-1)
    sorted_logits = jnp.take_along_axis(scores, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    last_ind = jnp.sum(cum < mass, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_shifted, last_ind, axis=-1)
    remove_sorted = sorted_shifted > cutoff
    if min_tokens_to_keep > 1:
        remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
    # scatter back to vocab order
    remove = jnp.take_along_axis(
        remove_sorted, jnp.argsort(order, axis=-1), axis=-1
    )
    return jnp.where(remove, NEG_INF, scores)


class GPTDecoder:
    """Compiled decode programs for one UnifiedVoice parameterization.

    Programs are cached per (batch, prompt_len, max_new) static signature.
    """

    def __init__(
        self,
        model: UnifiedVoice,
        cfg: GPTConfig,
        sampling: SamplingConfig = SamplingConfig(),
        param_dtype: Any = jnp.float32,
    ):
        # attn_impl="auto": measured dispatch. The full sweep
        # (tools/bench_decode_kernels.py, v5e, w8a8, 400-step decode) has the
        # XLA attention over the int8 KV cache winning at EVERY batch size:
        # B=1 896 tok/s vs 793 (pallas_q8 dma) / 802 (grid); B=8 4115 vs
        # 2558 (grid blk512); B=16 4508 vs 2787. An earlier v5e sweep had
        # pallas_q8 ahead at B=1 (965 vs 891), but the per-step wins since
        # (int8 logits-head option, hoisted bucketed-prefix switch, in-place
        # KV writes) moved the XLA path past it. So "auto" = xla(+kv_quant as
        # configured) everywhere; the Pallas kernels stay available and
        # token-exact via TARS_ATTN_IMPL=pallas_q8 / pallas_ragged for
        # re-measurement on future hardware.
        self._q8_sibling: Optional["GPTDecoder"] = None
        if getattr(model, "attn_impl", "xla") == "auto":
            if os.environ.get("TARS_Q8_SIBLING", "0") == "1":
                # opt-in: route B=1 through the fused-dequant int8 kernel
                self._q8_sibling = GPTDecoder(
                    model.clone(attn_impl="pallas_q8", kv_quant=False),
                    cfg, sampling, param_dtype,
                )
            model = model.clone(attn_impl="xla")
        self.model = model
        self.cfg = cfg
        self.sampling = sampling
        self.param_dtype = param_dtype
        # re-read the phase grid per decoder so a process can flip
        # TARS_DECODE_PHASE between decoder builds (the class attribute is
        # only the import-time default)
        self.PHASE = int(os.environ.get("TARS_DECODE_PHASE", str(type(self).PHASE)))
        self._generate_jit = functools.partial(
            jax.jit,
            static_argnames=("max_new",),
        )(self._generate)
        self._cond_prefill_jit = None

    @property
    def supports_cond_kv(self) -> bool:
        """Whether generate(cond_kv=...) is usable. The standard float layout
        and the int8 layout (kv_quant: cond KV is cached already-quantized,
        see cond_prefill) both reuse; only the Pallas blocked/transposed
        layouts re-prefill."""
        impl = getattr(self.model, "attn_impl", "xla")
        if getattr(self.model, "kv_quant", False):
            return impl == "xla"
        return impl in ("xla", "xla_bucketed")

    # -- prompt assembly (host side, tiny) ---------------------------------

    def build_text_prompt_arrays(
        self, text_ids: np.ndarray, text_lens: np.ndarray, bucket: int,
        align: str = "right",
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Place [start][text][stop] inside a (B, bucket+2) buffer.

        align="right" mirrors prepare_gpt_inputs left-padding
        (model_v2.py:749-779) — pads before the sequence. align="left" puts
        the sequence first (pads after): numerically equivalent (pads are
        masked and carry no position), but shared text PREFIXES then occupy
        request-independent window slots, which is what text-prefix KV reuse
        needs (reference analog: chained block hashes,
        accel/kv_manager.py:106-115)."""
        B = text_ids.shape[0]
        L = bucket + 2
        ids = np.zeros((B, L), dtype=np.int32)
        pos = np.zeros((B, L), dtype=np.int32)
        valid = np.zeros((B, L), dtype=bool)
        for b in range(B):
            n = int(text_lens[b])
            seq = [self.cfg.start_text_token] + list(text_ids[b, :n]) + [
                self.cfg.stop_text_token
            ]
            off = 0 if align == "left" else L - len(seq)
            ids[b, off:off + len(seq)] = seq
            pos[b, off:off + len(seq)] = np.arange(len(seq))
            valid[b, off:off + len(seq)] = True
        return ids, pos, valid

    def text_prefix_prefill(self, params, conds_latent, prefix_ids):
        """Prefill [conds][start_text][prefix tokens] and return its float KV
        (pk, pv) each (L, 1, H, P+1+m, Dh) — a reusable cross-request prefix
        for generate(cond_kv=...) when prompts are built LEFT-aligned (the
        prefix then occupies the same window slots in every request sharing
        it). The engine caches these per (speaker, text-prefix-hash) at a
        fixed grid, the TPU analog of the reference's chained-hash text-block
        reuse (accel/kv_manager.py:106-198)."""
        m = len(prefix_ids)
        ids = np.concatenate(
            [[self.cfg.start_text_token], np.asarray(prefix_ids)]
        ).astype(np.int32)[None]
        pos = np.arange(m + 1, dtype=np.int32)[None]
        valid = np.ones((1, m + 1), bool)
        if not hasattr(self, "_text_prefix_jit"):
            def f(params, conds_latent, ids, pos, valid):
                emb = self.model.apply(
                    params, ids, pos, valid,
                    method=UnifiedVoice.embed_text_prompt,
                )
                prompt = jnp.concatenate(
                    [conds_latent.astype(emb.dtype), emb], axis=1
                )
                mask = jnp.ones(prompt.shape[:2], dtype=bool)
                _, (pk, pv) = self.model.apply(
                    params, prompt, mask, method=UnifiedVoice.gpt_prefill
                )
                return pk, pv

            self._text_prefix_jit = jax.jit(f)
        return self._text_prefix_jit(
            params, conds_latent, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid),
        )

    # -- jitted generation --------------------------------------------------

    # token-block size of the int8 block-major cache (attn_impl="pallas_q8")
    BLKQ = int(os.environ.get("TARS_BLKQ", "256"))
    # phased-decode grid: >0 subdivides the decode loop into phases whose
    # attention reads are statically bounded to the growing valid prefix
    # (lane-aligned multiples; 0 disables = single full-cap loop)
    PHASE = int(os.environ.get("TARS_DECODE_PHASE", "0"))

    def _decode_step_call(self, params, emb, caches, cache_index,
                          kv_valid_len, cap_mask, prefix_limit=None):
        """One transformer decode step. `caches` is (ks, vs) or, with
        kv_quant, (ks, vs, ksc, vsc) int8+scales. Bucketed-prefix attention
        (attn_impl="xla_bucketed") is handled inside GPT2Core with a
        per-layer lax.switch wrapping only the ctx computation — wrapping
        the whole layer stack in one switch was measured 2.3x slower at cap
        1664 because XLA conditionals copy the loop-carried caches at the
        branch boundary. A STATIC prefix_limit instead bounds the read with
        a zero-overhead static slice (phased decode)."""
        return self.model.apply(
            params, emb, caches, cache_index, kv_valid_len, cap_mask,
            prefix_limit,
            method=UnifiedVoice.gpt_decode_step,
        )

    def _prefill_with_cond(self, params, cond_kv, tail, cap_mask, B: int,
                           cap: int):
        """Chunk-prefill the text tail on top of the cached FLOAT conds-prefix
        KV (cond_prefill output). Allocates width-`cap` float caches with the
        prefix scattered at [0, P), runs the tail through one decode-step
        chunk, and returns (last_hidden, ks, vs) — width-cap float caches
        holding the full prompt KV, ready to use directly (float layout) or
        to quantize (kv_quant layout, same values the monolithic prefill
        quantizes)."""
        ck0, cv0 = cond_kv
        L, _, H, P, Dh = ck0.shape
        S = P + tail.shape[1]
        ks = jnp.zeros((L, B, H, cap, Dh), ck0.dtype)
        vs = jnp.zeros((L, B, H, cap, Dh), cv0.dtype)
        ks = jax.lax.dynamic_update_slice(
            ks, jnp.broadcast_to(ck0, (L, B, H, P, Dh)), (0, 0, 0, 0, 0)
        )
        vs = jax.lax.dynamic_update_slice(
            vs, jnp.broadcast_to(cv0, (L, B, H, P, Dh)), (0, 0, 0, 0, 0)
        )
        hidden, (ks, vs) = self.model.apply(
            params,
            tail,
            (ks, vs),
            P,
            jnp.full((B,), S, jnp.int32),
            cap_mask,
            method=UnifiedVoice.gpt_decode_step,
        )
        return hidden[:, -1], ks, vs

    def _generate(
        self,
        params,
        conds_latent: jnp.ndarray,  # (B, 34, D)
        text_ids: jnp.ndarray,  # (B, Lt) right-aligned
        text_pos: jnp.ndarray,
        text_valid: jnp.ndarray,
        key: jnp.ndarray,
        temperature: jnp.ndarray,
        top_p: jnp.ndarray,
        repetition_penalty: jnp.ndarray,
        max_new: int,
        cond_kv=None,
    ):
        cfg = self.cfg
        model = self.model
        s = self.sampling
        B = conds_latent.shape[0]
        V = cfg.number_mel_codes

        text_emb = model.apply(
            params,
            text_ids,
            text_pos,
            text_valid,
            method=UnifiedVoice.embed_text_prompt,
        )
        start_emb = model.apply(params, B, method=UnifiedVoice.embed_mel_start)
        # left-pad mask: pads only in the text section
        cond_mask = jnp.ones((B, conds_latent.shape[1]), dtype=bool)
        start_mask = jnp.ones((B, 1), dtype=bool)
        prompt_mask = jnp.concatenate([cond_mask, text_valid, start_mask], axis=1)
        # Reference puts [pad][cond][text]; we put [cond][pad-inside-text][text].
        # Attention is permutation-invariant over masked-out keys (their
        # embeddings are zeroed and masked), and no position is assigned to
        # pads in either layout, so logits match the reference exactly.

        P = conds_latent.shape[1]
        tail = jnp.concatenate(
            [text_emb, start_emb.astype(text_emb.dtype)], axis=1
        )
        S = P + tail.shape[1]
        cap = S + max_new
        attn_impl = getattr(model, "attn_impl", "xla")
        transposed = attn_impl == "pallas_ragged"
        blocked_q8 = attn_impl == "pallas_q8"
        if transposed:
            # the ragged kernel DMAs 128-multiple token blocks
            cap = ((cap + 127) // 128) * 128
        if blocked_q8:
            cap = ((cap + self.BLKQ - 1) // self.BLKQ) * self.BLKQ
        cap_mask = jnp.concatenate(
            [prompt_mask, jnp.ones((B, max_new), dtype=bool)], axis=1
        )

        if cond_kv is None:
            prompt = jnp.concatenate(
                [conds_latent.astype(text_emb.dtype), tail], axis=1
            )
            hidden, (pk, pv) = model.apply(
                params, prompt, prompt_mask, method=UnifiedVoice.gpt_prefill
            )
            L, _, H, _, Dh = pk.shape
            if transposed:
                # ragged kernel layout: token axis on lanes (L,B,H,Dh,cap)
                ks = jnp.zeros((L, B, H, Dh, cap), pk.dtype)
                vs = jnp.zeros((L, B, H, Dh, cap), pv.dtype)
                ks = jax.lax.dynamic_update_slice(
                    ks, pk.transpose(0, 1, 2, 4, 3), (0, 0, 0, 0, 0)
                )
                vs = jax.lax.dynamic_update_slice(
                    vs, pv.transpose(0, 1, 2, 4, 3), (0, 0, 0, 0, 0)
                )
            elif blocked_q8:
                # int8 block-major caches for the fused-dequant Pallas kernel
                # (ops/decode_attention.py): (L,B,NB,H,Dh,blk) int8 + scales
                from indextts_tpu.models.gpt2 import quantize_kv
                from indextts_tpu.ops.decode_attention import (
                    to_blocked_cache,
                    to_blocked_scales,
                )

                blkq = self.BLKQ
                pkq, pks = quantize_kv(pk)  # (L,B,H,S,Dh) int8, (L,B,H,S)
                pvq, pvs = quantize_kv(pv)
                padS = [(0, 0), (0, 0), (0, 0), (0, cap - S), (0, 0)]
                k8_b = to_blocked_cache(jnp.pad(pkq, padS), blkq)
                v8_b = to_blocked_cache(jnp.pad(pvq, padS), blkq)
                pad_sc = [(0, 0), (0, 0), (0, 0), (0, cap - S)]
                caches = (k8_b, v8_b,
                          to_blocked_scales(jnp.pad(pks, pad_sc), blkq),
                          to_blocked_scales(jnp.pad(pvs, pad_sc), blkq))
            elif getattr(model, "kv_quant", False):
                # int8 KV cache (models/gpt2.py quantize_kv): quantize the
                # prefill KV once, decode reads only int8 + scales
                from indextts_tpu.models.gpt2 import quantize_kv

                pkq, pks = quantize_kv(pk)  # (L,B,H,S,Dh) int8, (L,B,H,S) f32
                pvq, pvs = quantize_kv(pv)
                ks = jnp.zeros((L, B, H, cap, Dh), jnp.int8)
                vs = jnp.zeros((L, B, H, cap, Dh), jnp.int8)
                ksc = jnp.zeros((L, B, H, cap), jnp.float32)
                vsc = jnp.zeros((L, B, H, cap), jnp.float32)
                ks = jax.lax.dynamic_update_slice(ks, pkq, (0, 0, 0, 0, 0))
                vs = jax.lax.dynamic_update_slice(vs, pvq, (0, 0, 0, 0, 0))
                ksc = jax.lax.dynamic_update_slice(ksc, pks, (0, 0, 0, 0))
                vsc = jax.lax.dynamic_update_slice(vsc, pvs, (0, 0, 0, 0))
                caches = (ks, vs, ksc, vsc)
            else:
                ks = jnp.zeros((L, B, H, cap, Dh), pk.dtype)
                vs = jnp.zeros((L, B, H, cap, Dh), pv.dtype)
                ks = jax.lax.dynamic_update_slice(ks, pk, (0, 0, 0, 0, 0))
                vs = jax.lax.dynamic_update_slice(vs, pv, (0, 0, 0, 0, 0))
            if not blocked_q8 and not getattr(model, "kv_quant", False):
                caches = (ks, vs)
            last_hidden = hidden[:, -1]
        else:
            # prefix-KV reuse (reference: accel/kv_manager.py:106-198 chained-
            # hash block reuse): the cached float prefix covers the conds
            # section (width P) or, with text-prefix reuse (LEFT-aligned
            # prompts), conds + start_text + m text tokens (width P+1+m) —
            # the chunk prefill then computes only the remaining tail. Under
            # kv_quant the combined float KV is then quantized — the same
            # values the monolithic prefill quantizes, so greedy parity holds
            # and the decode loop reads int8 only.
            prefix_extra = cond_kv[0].shape[3] - P
            last_hidden, ks, vs = self._prefill_with_cond(
                params, cond_kv,
                tail[:, prefix_extra:] if prefix_extra else tail,
                cap_mask, B, cap,
            )
            if getattr(model, "kv_quant", False):
                from indextts_tpu.models.gpt2 import quantize_kv

                kq, ksc = quantize_kv(ks)
                vq, vsc = quantize_kv(vs)
                caches = (kq, vq, ksc, vsc)
            else:
                caches = (ks, vs)

        last_logits = model.apply(
            params, last_hidden, method=UnifiedVoice.mel_logits_from_hidden
        )

        penal_mask = jnp.zeros((B, V), dtype=bool)
        if s.use_repetition_penalty and s.hf_fake_prompt_penalty:
            penal_mask = penal_mask.at[:, 1].set(True)
            penal_mask = penal_mask.at[:, cfg.start_mel_token].set(True)

        codes0 = jnp.full((B, max_new), cfg.stop_mel_token, dtype=jnp.int32)
        finished0 = jnp.zeros((B,), dtype=bool)

        def make_cond(end: int):
            def cond_fn(state):
                step, _, _, _, finished, _, _ = state
                return jnp.logical_and(step < end, ~jnp.all(finished))

            return cond_fn

        def make_body(prefix_limit):
            def body_fn(state):
                step, codes, logits, caches, finished, key, penal_mask = state
                key, sub = jax.random.split(key)
                lg = logits
                if s.use_repetition_penalty:
                    lg = _repetition_penalty(lg, penal_mask, repetition_penalty)
                if s.use_typical_sampling:
                    lg = typical_filter(lg, s.typical_mass)
                if s.ban_stop_token:
                    lg = lg.at[:, cfg.stop_mel_token].set(NEG_INF)
                if s.do_sample:
                    tok = _apply_top_k_top_p_sample(
                        lg, sub, temperature, top_p, s.top_k
                    )
                else:
                    tok = jnp.argmax(lg, axis=-1)
                tok = jnp.where(finished, cfg.stop_mel_token, tok).astype(jnp.int32)
                codes = jax.lax.dynamic_update_slice(codes, tok[:, None], (0, step))
                newly_finished = tok == cfg.stop_mel_token
                finished = jnp.logical_or(finished, newly_finished)
                penal_mask = penal_mask.at[jnp.arange(B), tok].set(True)

                emb = self.model.apply(
                    params, tok, step, method=UnifiedVoice.embed_mel_step
                )
                hidden, caches = self._decode_step_call(
                    params, emb, caches, S + step,
                    jnp.full((B,), S + step + 1, jnp.int32), cap_mask,
                    prefix_limit=prefix_limit,
                )
                logits = self.model.apply(
                    params, hidden[:, 0],
                    method=UnifiedVoice.mel_logits_from_hidden,
                )
                return (step + 1, codes, logits, caches, finished, key,
                        penal_mask)

            return body_fn

        state = (
            jnp.asarray(0, jnp.int32),
            codes0,
            last_logits,
            caches,
            finished0,
            key,
            penal_mask,
        )
        # phased decode (prefix-proportional attention reads): the loop runs
        # in phases with a STATIC cache-read limit that grows with the valid
        # prefix — phase k reads only the first lim_k positions via a static
        # slice (reference analog: flash_attn_with_kvcache reads only valid
        # blocks, accel/attention.py:129-153). Token-identical to the
        # monolithic loop: every position >= the valid length is masked in
        # both. Enabled when the phase grid (TARS_DECODE_PHASE) subdivides
        # the cap; pallas layouts keep their own prefix handling.
        G = self.PHASE
        if (G > 0 and attn_impl in ("xla", "xla_bucketed")
                and (-(-(S + 1) // G) * G) < cap):
            phases = []
            k = -(-(S + 1) // G)
            while True:
                lim = min(k * G, cap)
                end = min(lim - S, max_new)
                phases.append((lim, end))
                if end >= max_new:
                    break
                k += 1
            for lim, end in phases:
                state = jax.lax.while_loop(
                    make_cond(end), make_body(lim), state
                )
            step, codes, *_ = state
        else:
            step, codes, *_ = jax.lax.while_loop(
                make_cond(max_new), make_body(None), state
            )

        # length = index of first stop + 1 (capped at max_new)
        is_stop = codes == cfg.stop_mel_token
        first_stop = jnp.argmax(is_stop, axis=1)
        has_stop = jnp.any(is_stop, axis=1)
        lengths = jnp.where(has_stop, first_stop + 1, max_new).astype(jnp.int32)
        return codes, lengths

    # -- beam search --------------------------------------------------------

    def _generate_beam(
        self,
        params,
        conds_latent,  # (1, 34, D)
        text_ids,
        text_pos,
        text_valid,
        repetition_penalty: jnp.ndarray,
        max_new: int,
        num_beams: int,
        length_penalty: jnp.ndarray,
        key: Optional[jnp.ndarray] = None,
        temperature: Optional[jnp.ndarray] = None,
        top_p: Optional[jnp.ndarray] = None,
        do_sample: bool = False,
        cond_kv=None,
    ):
        """HF _beam_search semantics (vendored
        transformers_generation_utils.py:3325-3560), both variants:

        do_sample=False — deterministic beam search: top-2*nb candidates of
        log_softmax + repetition penalty + beam scores.

        do_sample=True — beam-multinomial sampling (the reference's DEFAULT
        serving config, infer_v2.py:714-722 with serve_tars never enabling
        accel): after the repetition penalty the warper chain runs per beam
        (temperature -> top-k(30) -> top-p, min_tokens_to_keep=2,
        :1019-1043), then 2*nb candidates are drawn WITHOUT replacement from
        softmax over the flattened (nb*V) scores (:3511-3518) — realized here
        with the Gumbel-top-k trick, which samples the identical
        distribution — and sorted by their unperturbed scores. Token-exact
        parity with torch.multinomial is impossible (different RNG); the
        deterministic variant is the token-parity target.

        Cache layouts: float, or int8+scales when kv_quant (the reference-
        default serving route then pays the same halved KV stream as the
        sampling loop). cond_kv (from cond_prefill, layout-matched) replaces
        the conds-section prefill — only the text tail is chunk-prefilled."""
        cfg = self.cfg
        model = self.model
        s = self.sampling
        nb = num_beams
        V = cfg.number_mel_codes
        quant = bool(getattr(model, "kv_quant", False))

        text_emb = model.apply(
            params, text_ids, text_pos, text_valid,
            method=UnifiedVoice.embed_text_prompt,
        )
        start_emb = model.apply(params, 1, method=UnifiedVoice.embed_mel_start)
        P = conds_latent.shape[1]
        tail = jnp.concatenate(
            [text_emb, start_emb.astype(text_emb.dtype)], axis=1
        )
        prompt_mask = jnp.concatenate(
            [jnp.ones((1, P), bool), text_valid, jnp.ones((1, 1), bool)],
            axis=1,
        )
        S = P + tail.shape[1]
        cap = S + max_new
        cap_mask1 = jnp.concatenate(
            [prompt_mask, jnp.ones((1, max_new), bool)], axis=1
        )

        if cond_kv is not None:
            # cached float prefix (conds-only or conds+text-prefix);
            # chunk-prefill the remaining tail at B=1 (same numerics
            # discipline as _generate)
            prefix_extra = cond_kv[0].shape[3] - P
            last_hidden, ks1, vs1 = self._prefill_with_cond(
                params, cond_kv,
                tail[:, prefix_extra:] if prefix_extra else tail,
                cap_mask1, 1, cap,
            )
        else:
            prompt = jnp.concatenate(
                [conds_latent.astype(text_emb.dtype), tail], axis=1
            )
            hidden, (pk, pv) = model.apply(
                params, prompt, prompt_mask, method=UnifiedVoice.gpt_prefill
            )
            last_hidden = hidden[:, -1]
            L, _, H, _, Dh = pk.shape
            ks1 = jnp.zeros((L, 1, H, cap, Dh), pk.dtype)
            vs1 = jnp.zeros((L, 1, H, cap, Dh), pv.dtype)
            ks1 = jax.lax.dynamic_update_slice(ks1, pk, (0, 0, 0, 0, 0))
            vs1 = jax.lax.dynamic_update_slice(vs1, pv, (0, 0, 0, 0, 0))
        if quant:
            from indextts_tpu.models.gpt2 import quantize_kv

            kq, ksc = quantize_kv(ks1)
            vq, vsc = quantize_kv(vs1)
            caches1 = (kq, vq, ksc, vsc)
        else:
            caches1 = (ks1, vs1)
        # expand to beams (prefill KV identical across beams)
        caches = jax.tree_util.tree_map(
            lambda c: jnp.repeat(c, nb, axis=1), caches1
        )
        cap_mask = jnp.repeat(cap_mask1, nb, axis=0)
        logits0 = model.apply(
            params, last_hidden, method=UnifiedVoice.mel_logits_from_hidden
        )
        logits0 = jnp.repeat(logits0, nb, axis=0)

        beam_scores0 = jnp.concatenate(
            [jnp.zeros((1,)), jnp.full((nb - 1,), NEG_INF)]
        )
        codes0 = jnp.full((nb, max_new), cfg.stop_mel_token, jnp.int32)
        penal0 = jnp.zeros((nb, V), bool)
        if s.use_repetition_penalty and s.hf_fake_prompt_penalty:
            penal0 = penal0.at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)
        # finalized-hypothesis pool (HF BeamHypotheses, max nb entries)
        fin_scores0 = jnp.full((nb,), NEG_INF)  # normalized scores
        fin_codes0 = jnp.full((nb, max_new), cfg.stop_mel_token, jnp.int32)
        fin_lens0 = jnp.zeros((nb,), jnp.int32)

        def make_beam_body(prefix_limit):
          def body_fn(state):
            (step, codes, logits, caches, beam_scores, penal,
             fin_scores, fin_codes, fin_lens, key) = state
            # HF beam_search order: log_softmax FIRST, then processors
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            if s.use_repetition_penalty:
                logp = _repetition_penalty(logp, penal, repetition_penalty)
            if s.ban_stop_token:
                logp = logp.at[:, cfg.stop_mel_token].set(NEG_INF)
            if do_sample:
                # warper chain per beam row on the processed scores
                w = logp / temperature
                vals, idx = jax.lax.top_k(w, s.top_k)
                probs = jax.nn.softmax(vals, axis=-1)
                cum = jnp.cumsum(probs, axis=-1)
                keep = (cum - probs) < top_p
                keep = keep.at[:, :2].set(True)  # min_tokens_to_keep=2 (beam)
                masked = jnp.where(keep, vals, NEG_INF)
                logp = jnp.full_like(w, NEG_INF).at[
                    jnp.arange(nb)[:, None], idx
                ].set(masked)
            total = beam_scores[:, None] + logp  # (nb, V)
            flat = total.reshape(-1)
            if do_sample:
                key, sub = jax.random.split(key)
                gumbel = jax.random.gumbel(sub, flat.shape, jnp.float32)
                _, cand_idx = jax.lax.top_k(flat + gumbel, 2 * nb)
                cand_scores = flat[cand_idx]
                order = jnp.argsort(-cand_scores)  # HF sorts by true score
                cand_scores = cand_scores[order]
                cand_idx = cand_idx[order]
            else:
                cand_scores, cand_idx = jax.lax.top_k(flat, 2 * nb)
            cand_beam = cand_idx // V
            cand_tok = (cand_idx % V).astype(jnp.int32)
            is_eos = cand_tok == cfg.stop_mel_token

            # finalize eos candidates ranked < nb (HF _process)
            rank = jnp.arange(2 * nb)
            finalize = jnp.logical_and(is_eos, rank < nb)
            # normalized score: sum / ((prompt + generated) ** lp)
            norm_len = jnp.asarray(S + step, jnp.float32)
            new_fin_scores = jnp.where(
                finalize, cand_scores / jnp.power(norm_len, length_penalty), NEG_INF
            )
            # candidate hypothesis codes: beam prefix + eos at `step`
            cand_codes = codes[cand_beam]
            cand_codes = jax.lax.dynamic_update_slice(
                cand_codes, cand_tok[:, None], (0, step)
            )
            all_fin_scores = jnp.concatenate([fin_scores, new_fin_scores])
            all_fin_codes = jnp.concatenate([fin_codes, cand_codes])
            all_fin_lens = jnp.concatenate(
                [fin_lens, jnp.full((2 * nb,), step + 1, jnp.int32)]
            )
            keep_scores, keep_idx = jax.lax.top_k(all_fin_scores, nb)
            fin_scores = keep_scores
            fin_codes = all_fin_codes[keep_idx]
            fin_lens = all_fin_lens[keep_idx]

            # next active beams: first nb non-eos candidates
            active_scores = jnp.where(is_eos, NEG_INF, cand_scores)
            next_scores, next_pos = jax.lax.top_k(active_scores, nb)
            beam_idx = cand_beam[next_pos]
            tok = cand_tok[next_pos]
            beam_scores = next_scores

            codes = codes[beam_idx]
            penal = penal[beam_idx]
            # reorder every cache component (int8 codes + scales included) by
            # the surviving beams — HF _reorder_cache (model_v2.py:227-240).
            # One full-cap fused gather, deliberately: restricting the gather
            # to the generated region (slice + gather + dynamic_update_slice)
            # was measured 1.8x SLOWER e2e on v5e (2.62 vs 4.76 audio-s/s) —
            # the carried cache stays live as the update-slice operand, so
            # XLA materializes an extra full-cap copy instead of donating,
            # while the plain gather replaces the buffer in one pass.
            caches = jax.tree_util.tree_map(
                lambda c: c[:, beam_idx], caches
            )
            codes = jax.lax.dynamic_update_slice(codes, tok[:, None], (0, step))
            penal = penal.at[jnp.arange(nb), tok].set(True)

            emb = model.apply(params, tok, step, method=UnifiedVoice.embed_mel_step)
            hidden, caches = self._decode_step_call(
                params, emb, caches, S + step,
                jnp.full((nb,), S + step + 1, jnp.int32), cap_mask,
                prefix_limit=prefix_limit,
            )
            logits = model.apply(
                params, hidden[:, 0], method=UnifiedVoice.mel_logits_from_hidden
            )
            return (step + 1, codes, logits, caches, beam_scores, penal,
                    fin_scores, fin_codes, fin_lens, key)

          return body_fn

        def make_beam_cond(end: int):
          def cond_fn(state):
            (step, _, _, _, beam_scores, _, fin_scores, _, _, _) = state
            # HF is_done (early_stopping=False): nb finalized AND the worst
            # finalized beats the best possible active continuation
            n_fin_full = fin_scores[nb - 1] > NEG_INF
            cur_norm = jnp.max(beam_scores) / jnp.power(
                jnp.asarray(S, jnp.float32) + step.astype(jnp.float32),
                length_penalty,
            )
            done = jnp.logical_and(n_fin_full, fin_scores[nb - 1] >= cur_norm)
            return jnp.logical_and(step < end, ~done)

          return cond_fn

        if key is None:
            key = jax.random.PRNGKey(0)
        if temperature is None:
            temperature = jnp.asarray(1.0, jnp.float32)
        if top_p is None:
            top_p = jnp.asarray(1.0, jnp.float32)
        state = (
            jnp.asarray(0, jnp.int32), codes0, logits0, caches,
            beam_scores0, penal0, fin_scores0, fin_codes0, fin_lens0, key,
        )
        # phased beam decode (same grid semantics as the sampling loop):
        # each phase's ATTENTION READS are statically bounded to the growing
        # valid prefix (the cache reorder stays the full-cap gather — see
        # the measured-revert note at the gather site); token-identical to
        # the monolithic loop (positions >= the valid length are masked in
        # both)
        G = self.PHASE
        attn_impl = getattr(model, "attn_impl", "xla")
        if (G > 0 and attn_impl in ("xla", "xla_bucketed")
                and (-(-(S + 1) // G) * G) < cap):
            k = -(-(S + 1) // G)
            while True:
                lim = min(k * G, cap)
                end = min(lim - S, max_new)
                state = jax.lax.while_loop(
                    make_beam_cond(end), make_beam_body(lim), state
                )
                if end >= max_new:
                    break
                k += 1
        else:
            state = jax.lax.while_loop(
                make_beam_cond(max_new), make_beam_body(None), state
            )
        (step, codes, _, _, beam_scores, _, fin_scores, fin_codes,
         fin_lens, _) = state

        # finalize: merge still-active beams (no eos; length = step)
        act_norm = beam_scores / jnp.power(
            jnp.asarray(S, jnp.float32) + step.astype(jnp.float32), length_penalty
        )
        all_scores = jnp.concatenate([fin_scores, act_norm])
        all_codes = jnp.concatenate([fin_codes, codes])
        all_lens = jnp.concatenate(
            [fin_lens, jnp.full((nb,), step, jnp.int32)]
        )
        best = jnp.argmax(all_scores)
        return all_codes[best][None], all_lens[best][None].astype(jnp.int32)

    def ensure_beam_jit(self):
        """Materialize the beam jit wrapper. Idempotent; call once from a
        single thread before issuing concurrent generate_beam calls (the
        wrapper object itself is not created under a lock — precompile()
        fans compiles out over threads and must not race its creation)."""
        if not hasattr(self, "_beam_jit"):
            self._beam_jit = jax.jit(
                self._generate_beam,
                static_argnames=("max_new", "num_beams", "do_sample"),
            )

    def generate_beam(
        self,
        params,
        conds_latent,
        text_ids,
        text_pos,
        text_valid,
        max_new: int,
        num_beams: int = 3,
        repetition_penalty: float = 10.0,
        length_penalty: float = 0.0,
        do_sample: bool = False,
        key: Optional[jnp.ndarray] = None,
        temperature: float = 1.0,
        top_p: float = 1.0,
        cond_kv=None,
    ) -> GenerateResult:
        """Beam decode for ONE request (B=1; the batch axis carries the nb
        beams). This matches the reference exactly: its HF beam path also
        processes one segment at a time (infer_v2.py:761-776 is called per
        segment with batch 1), and its accel batch engine ignores num_beams
        entirely (model_v2.py:871-883). Multi-request throughput goes through
        the batched sampling loop instead."""
        self.ensure_beam_jit()
        codes, lengths = self._beam_jit(
            params, conds_latent, text_ids, text_pos, text_valid,
            jnp.asarray(repetition_penalty, jnp.float32),
            max_new=max_new, num_beams=num_beams,
            length_penalty=jnp.asarray(length_penalty, jnp.float32),
            key=key,
            temperature=jnp.asarray(temperature, jnp.float32),
            top_p=jnp.asarray(top_p, jnp.float32),
            do_sample=do_sample,
            cond_kv=cond_kv,
        )
        return GenerateResult(codes=codes, lengths=lengths)

    # -- continuous batching programs ---------------------------------------
    # Cross-request join/leave: N slots decode in lockstep chunks; between
    # chunks the host refills finished slots (prefill as its own program, KV
    # inserted into the slot's rows). The TPU analog of the reference accel
    # engine's in-flight batching with continuous admission
    # (accel/engine.py:154-212 bookkeeping; here all bookkeeping is on-device
    # per-row state and admission happens at chunk boundaries so the hot loop
    # never syncs with the host).

    def prefill_request(self, params, conds_latent, text_ids, text_pos,
                        text_valid, cap: int):
        """Prefill ONE request (B=1). Returns (cache_pieces, last_logits
        (1,V), cap_mask (1,cap), S). cache_pieces is layout-matched to the
        model: (pk, pv) float (L,1,H,cap,Dh), or with kv_quant the
        quantize-on-insert pieces (kq, ksc, vq, vsc) — the admitted request's
        KV is written int8, so continuous-batched serving pays the halved KV
        stream from its first decode step (no float-sibling fallback)."""
        if not hasattr(self, "_prefill_req_jit"):
            self._prefill_req_jit = jax.jit(
                self._prefill_request, static_argnames=("cap",)
            )
        return self._prefill_req_jit(
            params, conds_latent, text_ids, text_pos, text_valid, cap=cap
        )

    def _prefill_request(self, params, conds_latent, text_ids, text_pos,
                         text_valid, cap: int):
        model = self.model
        text_emb = model.apply(
            params, text_ids, text_pos, text_valid,
            method=UnifiedVoice.embed_text_prompt,
        )
        start_emb = model.apply(params, 1, method=UnifiedVoice.embed_mel_start)
        prompt = jnp.concatenate(
            [conds_latent.astype(text_emb.dtype), text_emb,
             start_emb.astype(text_emb.dtype)], axis=1,
        )
        prompt_mask = jnp.concatenate(
            [jnp.ones((1, conds_latent.shape[1]), bool), text_valid,
             jnp.ones((1, 1), bool)], axis=1,
        )
        S = prompt.shape[1]
        assert S <= cap, (S, cap)
        hidden, (pk, pv) = model.apply(
            params, prompt, prompt_mask, method=UnifiedVoice.gpt_prefill
        )
        L, _, H, _, Dh = pk.shape
        padS = [(0, 0), (0, 0), (0, 0), (0, cap - S), (0, 0)]
        if getattr(model, "kv_quant", False):
            from indextts_tpu.models.gpt2 import quantize_kv

            kq, ksc = quantize_kv(pk)
            vq, vsc = quantize_kv(pv)
            pad_sc = [(0, 0), (0, 0), (0, 0), (0, cap - S)]
            # cache-tuple component order: (ks, vs, ksc, vsc)
            pieces = (
                jnp.pad(kq, padS), jnp.pad(vq, padS),
                jnp.pad(ksc, pad_sc), jnp.pad(vsc, pad_sc),
            )
        else:
            pieces = (jnp.pad(pk, padS), jnp.pad(pv, padS))
        cap_mask = jnp.concatenate(
            [prompt_mask, jnp.ones((1, cap - S), bool)], axis=1
        )
        last_logits = model.apply(
            params, hidden[:, -1], method=UnifiedVoice.mel_logits_from_hidden
        )
        return pieces, last_logits, cap_mask, S

    def insert_slot(self, caches, pieces, slot):
        """Write a prefilled request's cache rows into batch slot `slot`.

        caches/pieces are layout-matched tuples: float (ks, vs) with
        (pk, pv), or int8 (ks, vs, ksc, vsc) with (kq, ksc, vq, vsc) — every
        component scatters at batch index `slot`."""
        if not hasattr(self, "_insert_jit"):
            def f(caches, pieces, slot):
                out = []
                for c, p in zip(caches, pieces):
                    idx = (0, slot) + (0,) * (c.ndim - 2)
                    out.append(jax.lax.dynamic_update_slice(c, p, idx))
                return tuple(out)

            self._insert_jit = jax.jit(f, donate_argnums=(0,))
        return self._insert_jit(tuple(caches), tuple(pieces), slot)

    def step_chunk(self, params, state, chunk: int, max_new: int,
                   prefix_limit=None):
        """Advance all slots by up to `chunk` decode steps (early exit when
        every active slot is finished). `state` is the dict produced by
        ContinuousBatcher; per-row cache positions differ across slots.
        prefix_limit (STATIC, host-computed per chunk from the deepest slot)
        bounds the attention read to the valid prefix."""
        if not hasattr(self, "_chunk_jit"):
            self._chunk_jit = jax.jit(
                self._step_chunk,
                static_argnames=("chunk", "max_new", "prefix_limit"),
                donate_argnums=(1,),
            )
        return self._chunk_jit(
            params, state, chunk=chunk, max_new=max_new,
            prefix_limit=prefix_limit,
        )

    def _step_chunk(self, params, state, chunk: int, max_new: int,
                    prefix_limit=None):
        cfg = self.cfg
        model = self.model
        s = self.sampling
        B = state["logits"].shape[0]

        def cond_fn(st):
            i = st["i"]
            done = jnp.all(jnp.logical_or(st["finished"], ~st["active"]))
            return jnp.logical_and(i < chunk, ~done)

        def body_fn(st):
            key, sub = jax.random.split(st["key"])
            lg = st["logits"]
            if s.use_repetition_penalty:
                lg = _repetition_penalty(
                    lg, st["penal_mask"], st["rep_penalty"]
                )
            if s.use_typical_sampling:
                lg = typical_filter(lg, s.typical_mass)
            if s.ban_stop_token:
                lg = lg.at[:, cfg.stop_mel_token].set(NEG_INF)
            if s.do_sample:
                tok = _apply_top_k_top_p_sample(
                    lg, sub, st["temperature"], st["top_p"], s.top_k
                )
            else:
                tok = jnp.argmax(lg, axis=-1)
            idle = jnp.logical_or(st["finished"], ~st["active"])
            tok = jnp.where(idle, cfg.stop_mel_token, tok).astype(jnp.int32)
            # idle rows write out-of-range -> dropped (their buffer is final)
            write_at = jnp.where(idle, max_new, st["gen_count"])
            codes = st["codes"].at[jnp.arange(B), write_at].set(
                tok, mode="drop"
            )
            finished = jnp.logical_or(
                st["finished"], tok == cfg.stop_mel_token
            )
            gen_count = st["gen_count"] + jnp.where(idle, 0, 1)
            finished = jnp.logical_or(finished, gen_count >= max_new)
            penal_mask = st["penal_mask"].at[jnp.arange(B), tok].set(True)

            emb = model.apply(
                params, tok, st["gen_count"], method=UnifiedVoice.embed_mel_step
            )
            pos = jnp.minimum(st["pos"], st["ks"].shape[3] - 1)
            # cache tuple is layout-matched: float (ks, vs) or int8
            # (ks, vs, ksc, vsc) when the state carries scale planes
            if "ksc" in st:
                caches = (st["ks"], st["vs"], st["ksc"], st["vsc"])
            else:
                caches = (st["ks"], st["vs"])
            hidden, caches = self._decode_step_call(
                params, emb, caches, pos, pos + 1,
                st["cap_mask"], prefix_limit=prefix_limit,
            )
            logits = model.apply(
                params, hidden[:, 0], method=UnifiedVoice.mel_logits_from_hidden
            )
            new_caches = (
                {"ks": caches[0], "vs": caches[1], "ksc": caches[2],
                 "vsc": caches[3]}
                if len(caches) == 4
                else {"ks": caches[0], "vs": caches[1]}
            )
            return {
                **st,
                **new_caches,
                "i": st["i"] + 1,
                "key": key,
                "codes": codes,
                "logits": logits,
                "pos": jnp.where(idle, st["pos"], st["pos"] + 1),
                "gen_count": gen_count,
                "finished": finished,
                "penal_mask": penal_mask,
            }

        state = {**state, "i": jnp.asarray(0, jnp.int32)}
        state = jax.lax.while_loop(cond_fn, body_fn, state)
        state.pop("i")
        return state

    def cond_prefill(self, params, conds_latent) -> Tuple[jnp.ndarray, ...]:
        """Prefill the conds-only prefix and return its float KV
        (pk, pv) each (L, B, H, P, Dh).

        The conds section is the causal prefix of every prompt, so its KV
        depends only on the conds latents — cache the result per speaker and
        pass it to generate(cond_kv=...)/generate_beam(cond_kv=...) to skip
        its prefill (the TPU analog of the reference's cross-request prefix
        reuse, accel/kv_manager.py:106-198). The prefix is cached FLOAT even
        under kv_quant: the text tail chunk-prefills against the float
        prefix and the combined KV is quantized afterwards — exactly the
        values the monolithic int8 prefill quantizes, so greedy parity holds
        (it is ~8 MB per speaker; the decode loop still reads int8 only).

        Numerics: greedy decode is bit-identical to the monolithic prefill
        (tests/test_prefix_kv.py); sampled decode is identically distributed
        but may diverge at exact probability ties, because the chunked
        continuation is a different XLA fusion whose logits can differ in the
        last ulp. Each path is individually seed-deterministic."""
        if self._cond_prefill_jit is None:
            def f(params, conds_latent):
                mask = jnp.ones(conds_latent.shape[:2], dtype=bool)
                _, (pk, pv) = self.model.apply(
                    params, conds_latent.astype(self.model.dtype), mask,
                    method=UnifiedVoice.gpt_prefill,
                )
                return pk, pv

            self._cond_prefill_jit = jax.jit(f)
        return self._cond_prefill_jit(params, conds_latent)

    def generate(
        self,
        params,
        conds_latent,
        text_ids,
        text_pos,
        text_valid,
        key,
        max_new: int,
        temperature: float = 0.8,
        top_p: float = 0.8,
        repetition_penalty: float = 10.0,
        cond_kv=None,
    ) -> GenerateResult:
        if cond_kv is not None:
            assert getattr(self.model, "attn_impl", "xla") not in (
                "pallas_ragged", "pallas_q8"
            ), "prefix-KV reuse is implemented for the standard cache layout"
        if (
            self._q8_sibling is not None
            and cond_kv is None
            and conds_latent.shape[0] == 1
        ):
            return self._q8_sibling.generate(
                params, conds_latent, text_ids, text_pos, text_valid, key,
                max_new=max_new, temperature=temperature, top_p=top_p,
                repetition_penalty=repetition_penalty,
            )
        codes, lengths = self._generate_jit(
            params,
            conds_latent,
            text_ids,
            text_pos,
            text_valid,
            key,
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            jnp.asarray(repetition_penalty, jnp.float32),
            max_new=max_new,
            cond_kv=cond_kv,
        )
        return GenerateResult(codes=codes, lengths=lengths)
