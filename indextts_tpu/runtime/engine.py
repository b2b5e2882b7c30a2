"""IndexTTS2 inference engine: the full 5-model cascade, orchestrated.

Parity target: indextts/infer_v2.py IndexTTS2 (init :68-319, infer/
infer_generator :541-937) re-structured for XLA: the pipeline compiles into
five jitted programs (conditioning, AR decode, latent pass, s2mel CFM,
vocoder), each specialized per static shape bucket so repeat traffic hits the
compile cache.

Host<->device boundaries: one upload of prompt features per new speaker
prompt, one download of the waveform per segment — everything between stays
device-resident, like the reference keeps it GPU-resident (SURVEY §3.2).
"""

from __future__ import annotations

import functools
import os
import threading
import time
from dataclasses import dataclass
from typing import Any, Dict, Generator, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import IndexTTS2Config
from indextts_tpu.frontend import features as feat
from indextts_tpu.models.bigvgan import BigVGAN
from indextts_tpu.models.campplus import CAMPPlus
from indextts_tpu.models.repcodec import RepCodec
from indextts_tpu.models.s2mel import S2Mel
from indextts_tpu.models.unified_voice import UnifiedVoice
from indextts_tpu.models.w2vbert import W2VBertEncoder
from indextts_tpu.ops import mel as mel_ops
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
from indextts_tpu.runtime.s2mel_infer import cfm_inference, length_regulate, project_gpt_latent
from indextts_tpu.utils import audio as audio_utils


def evict_one(cache: Dict) -> None:
    """Drop one (oldest-inserted) entry from a bounded cache. Concurrent
    server threads can race here (TTSServer runs synth in a thread pool):
    both may pick the same victim or iterate a mutating dict — tolerate
    both instead of failing the in-flight request."""
    try:
        cache.pop(next(iter(cache)), None)
    except (StopIteration, RuntimeError):
        pass


def next_bucket(n: int, step: int, minimum: int = 0) -> int:
    return max(minimum, step * (-(-n // step)))


@dataclass
class SpeakerConditioning:
    """Per-prompt cached state (reference caches these, infer_v2.py:303-310)."""

    spk_cond_emb: jnp.ndarray  # (1, Tc, 1024) w2v-BERT features
    cond_len: int
    style: jnp.ndarray  # (1, 192)
    prompt_condition: jnp.ndarray  # (1, P, 512)
    ref_mel: jnp.ndarray  # (1, 80, P)
    ref_mel_len: int
    spk_latents: jnp.ndarray  # (1, 32, D) perceiver conditioning


@dataclass
class EmotionConditioning:
    emo_cond_emb: jnp.ndarray  # (1, Te, 1024)
    cond_len: int


@dataclass
class SegmentResult:
    wav: np.ndarray  # (T,) float32 at 22.05 kHz
    codes_len: int
    gpt_gen_time: float
    gpt_forward_time: float
    s2mel_time: float
    bigvgan_time: float


class IndexTTS2Engine:
    def __init__(
        self,
        cfg: IndexTTS2Config,
        params: Dict[str, Any],
        emo_matrix: Optional[np.ndarray] = None,
        spk_matrix: Optional[np.ndarray] = None,
        semantic_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        tokenizer=None,
        precise_shapes: bool = False,
        gpt_dtype=jnp.float32,
        voc_dtype=None,
        cond_dtype=jnp.float32,
    ):
        """
        params: {"gpt":…, "s2mel":…, "bigvgan":…, "repcodec":…, "campplus":…,
                 "w2vbert":…} flax param trees (see torch_convert).
        emo_matrix/spk_matrix: (sum(emo_num), 1024)/(…, 192) banks
                 (reference feat2.pt / feat1.pt, infer_v2.py:281-289).
        semantic_stats: (mean, std) each (1024,) — wav2vec2bert_stats.pt.
        precise_shapes: disable bucketing (exact-length compiles; parity mode).
        """
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.precise = precise_shapes
        if voc_dtype is None:
            voc_dtype = (
                jnp.bfloat16
                if cfg.runtime.voc_dtype == "bfloat16"
                else jnp.float32
            )

        wbits = cfg.runtime.gpt_wbits if cfg.runtime.gpt_quantize else 8
        gemv_impl = cfg.runtime.gemv_impl
        if gemv_impl == "auto":
            on_tpu = jax.devices()[0].platform == "tpu"
            if wbits == 4 and on_tpu:
                # the W4 win only exists through the packed-nibble Pallas
                # kernels (gemv_w4/mlp_w4 stream half the bytes); the XLA
                # fallback unpacks the whole matrix every step. Non-TPU
                # backends can't run the kernels (no pallas_interpret plumbed
                # here), so they take the XLA unpack path instead of failing
                # inside pallas_call. Note W4 targets B=1/low-row decode:
                # batched decode rows exceed TARS_GEMV_MAX_ROWS and fall back
                # to per-step unpacking, usually slower than W8.
                gemv_impl = "pallas"
            else:
                # measured on v5e (tools/bench_decode_kernels.py): the
                # streaming Pallas GEMV is parity with XLA's W8A8 GEMVs at
                # B=1 (893 vs 896 tok/s, within noise) and loses when batched
                # (3660 vs 4115 at rows<=8) — XLA's fused int8 GEMV stream is
                # already near its ~60%-of-roofline ceiling. Keep XLA; kernel
                # stays opt-in via TARS_GEMV_IMPL=pallas.
                gemv_impl = "xla"
        head_quant = cfg.runtime.head_quant and cfg.runtime.gpt_quantize
        self.gpt = UnifiedVoice(
            cfg.gpt, dtype=gpt_dtype, attn_impl=cfg.runtime.attn_impl,
            kv_quant=cfg.runtime.kv_quant,
            quantize_gpt=cfg.runtime.gpt_quantize,
            gemv_impl=gemv_impl,
            head_quant=head_quant,
            wbits=wbits,
        )
        self.s2mel = S2Mel(cfg.s2mel)
        self.bigvgan = BigVGAN(cfg.vocoder, dtype=voc_dtype)
        # B=1 vocoder optimum is fp32 (+ sliced-FIR snake): bf16 measured
        # SLOWER single-stream on v5e (0.19 vs 0.137 s; bf16 pays cast
        # overhead without bandwidth wins at B=1) while winning batched
        # (0.55 vs 0.85 s at B=8). Keep an fp32 sibling for the sequential
        # path when the batch mode runs bf16 (~110 MB extra params).
        self._voc_dual = voc_dtype != jnp.float32
        self.bigvgan_f32 = (
            BigVGAN(cfg.vocoder, dtype=jnp.float32)
            if self._voc_dual
            else self.bigvgan
        )
        self.repcodec = RepCodec(cfg.semantic_codec)
        self.campplus = CAMPPlus(cfg.campplus)
        self.w2vbert = W2VBertEncoder(cfg.w2vbert)

        # device-put once; NEVER close over params in jitted fns (closed-over
        # arrays become inline MLIR constants -> minutes-long compiles)
        put = jax.device_put

        def put_as(tree, dtype):
            """Store float params directly in the compute dtype: a fp32 store
            with bf16 compute would re-cast ~1GB of weights EVERY decode step
            (3x HBM traffic on the hot loop). int8 dequant scales stay fp32 —
            they are tiny (per-out-channel vectors) but bf16-rounding them
            (~0.4%) would double the W8 dequant error for zero bandwidth.

            Host-resident leaves are cast BEFORE device_put: bf16 halves the
            host->device bytes, which dominates engine startup through a
            tunneled TPU (same round-to-nearest-even rounding either side).
            Device-resident leaves keep the old put-then-cast path (pulling
            them back to host would be the opposite pessimization)."""
            if dtype == jnp.float32:
                return put(tree)
            np_dt = np.dtype(dtype)

            def cast(path, x):
                if any(
                    getattr(k, "key", None) == "kernel_scale" for k in path
                ):
                    return put(x)
                if isinstance(x, np.ndarray) and np.issubdtype(
                    x.dtype, np.floating
                ):
                    return put(x.astype(np_dt))
                y = put(x)
                if jnp.issubdtype(y.dtype, jnp.floating):
                    y = y.astype(dtype)
                return y

            return jax.tree_util.tree_map_with_path(cast, tree)

        p_gpt_raw = params["gpt"]
        if cfg.runtime.gpt_quantize:
            from indextts_tpu.runtime.torch_convert import quantize_gpt_tree

            p_gpt_raw = quantize_gpt_tree(
                p_gpt_raw, head=head_quant, bits=wbits
            )
        self.p_gpt = put_as(p_gpt_raw, gpt_dtype)
        # s2mel compute dtype (config.s2mel_dtype): bf16 params + bf16
        # activations through the MXU-bound DiT/regulator; the CFM Euler
        # state, norm statistics and attention softmax stay fp32
        self._s2mel_dt = (
            jnp.bfloat16
            if cfg.runtime.s2mel_dtype == "bfloat16"
            else jnp.float32
        )
        self.p_s2mel = put_as(params["s2mel"], self._s2mel_dt)
        self.p_bigvgan = put_as(params["bigvgan"], voc_dtype)
        self.p_bigvgan_f32 = (
            put_as(params["bigvgan"], jnp.float32)
            if self._voc_dual
            else self.p_bigvgan
        )
        self.p_repcodec = put(params["repcodec"])
        self.p_campplus = put(params["campplus"])
        self.p_w2vbert = put_as(params["w2vbert"], cond_dtype)

        if semantic_stats is None:
            mean = np.zeros(cfg.w2vbert.hidden_size, np.float32)
            std = np.ones(cfg.w2vbert.hidden_size, np.float32)
        else:
            mean, std = semantic_stats
        self.semantic_mean = jnp.asarray(mean)
        self.semantic_std = jnp.asarray(std)

        # emo matrix rows live in model_dim space: they are blended directly
        # with merge_emovec output (infer_v2.py:756-758)
        n_emo = sum(cfg.emo_num)
        if emo_matrix is None:
            emo_matrix = np.zeros((n_emo, cfg.gpt.model_dim), np.float32)
        if spk_matrix is None:
            spk_matrix = np.zeros((n_emo, 192), np.float32)
        splits = np.cumsum(cfg.emo_num)[:-1]
        self.emo_matrix = np.split(np.asarray(emo_matrix), splits)
        self.spk_matrix = np.split(np.asarray(spk_matrix), splits)

        self.decoder = GPTDecoder(
            self.gpt,
            cfg.gpt,
            SamplingConfig(do_sample=cfg.runtime.do_sample, top_k=cfg.runtime.top_k),
        )
        self._spk_cache: Dict[str, SpeakerConditioning] = {}
        # prefix-KV reuse: conds-section KV per (speaker, emotion) key
        # (reference: accel/kv_manager.py:106-198 cross-request block reuse)
        self._cond_kv_cache: Dict[tuple, tuple] = {}
        # (emovec, conds_latent) per conditioning key — skips two program
        # dispatches per segment for keyable (fixed-speaker) serving
        self._emoconds_cache: Dict[tuple, tuple] = {}
        # text-prefix KV reuse: [conds][start][text[:m]] KV per
        # (cond_key, m, sha256(text[:m])) at TEXT_PREFIX_GRAN granularity
        # (reference: chained block hashes, kv_manager.py:106-115)
        self._text_prefix_cache: Dict[tuple, tuple] = {}
        self._emo_cache: Dict[str, EmotionConditioning] = {}
        self._rng = jax.random.PRNGKey(0)
        # seedless requests split this stream; serving calls the engine from
        # several threads (HTTP workers, continuous-batcher tail pool), and an
        # unguarded split would hand two segments the same key
        self._rng_lock = threading.Lock()

        # jitted programs --------------------------------------------------
        self._w2v_program = jax.jit(self._w2v_features)
        self._campplus_program = jax.jit(self._campplus_style)
        self._conds_program = jax.jit(self._speaker_latents)
        self._emovec_program = jax.jit(self._merge_emovec, static_argnames=())
        self._latent_program = jax.jit(self._gpt_latent)
        self._s2mel_program = jax.jit(
            self._s2mel_mel, static_argnames=("target_len", "total_len")
        )
        self._vocoder_program = jax.jit(self._vocode)
        self._vocoder_pcm16_program = jax.jit(self._vocode_pcm16)
        if self._voc_dual:
            self._vocoder_f32_program = jax.jit(self._vocode_f32)
            self._vocoder_pcm16_f32_program = jax.jit(self._vocode_pcm16_f32)
        else:
            self._vocoder_f32_program = self._vocoder_program
            self._vocoder_pcm16_f32_program = self._vocoder_pcm16_program
        self._quantize_program = jax.jit(
            lambda p, x: self.repcodec.apply({"params": p}, x, method=RepCodec.quantize)
        )
        self._build_conds_program = jax.jit(
            lambda p, lat, ev: self.gpt.apply(
                {"params": p}, lat, ev, method=UnifiedVoice.build_conds_latent
            )
        )

    # ------------------------------------------------------------------
    # jitted bodies
    # ------------------------------------------------------------------

    def _w2v_features(self, p_w2vbert, features, mask, mean, std):
        h = self.w2vbert.apply({"params": p_w2vbert}, features, mask)
        h = (h - mean) / std
        return h

    def _campplus_style(self, p_campplus, fbank):
        return self.campplus.apply({"params": p_campplus}, fbank)

    def _speaker_latents(self, p_gpt, cond_emb, cond_len):
        return self.gpt.apply(
            {"params": p_gpt},
            cond_emb,
            cond_len,
            method=UnifiedVoice.get_conditioning,
        )

    def _merge_emovec(self, p_gpt, spk_cond, emo_cond, spk_len, emo_len, alpha):
        return self.gpt.apply(
            {"params": p_gpt},
            spk_cond,
            emo_cond,
            spk_len,
            emo_len,
            alpha,
            method=UnifiedVoice.merge_emovec,
        )

    def _gpt_latent(self, p_gpt, spk_latents, text_ids, text_len, codes, code_len, emovec):
        return self.gpt.apply(
            {"params": p_gpt},
            spk_latents,
            text_ids,
            text_len,
            codes,
            code_len,
            emovec,
            method=UnifiedVoice.forward_latent,
        )

    def _s2mel_mel(
        self,
        p_s2mel,
        p_repcodec,
        latent,
        codes,
        code_len,
        prompt_condition,
        ref_mel,
        ref_mel_len,
        style,
        noise,
        target_len: int,
        total_len: int,
    ):
        """gpt_layer + vq2emb + length-regulate + CFM (infer_v2.py:830-856)."""
        dt = self._s2mel_dt
        sp = {"params": p_s2mel}
        latent = self.s2mel.apply(
            sp, latent.astype(dt), method=S2Mel.project_gpt_latent
        )
        s_infer = self.repcodec.apply(
            {"params": p_repcodec}, codes, method=RepCodec.vq2emb
        )
        s_infer = (s_infer + latent.astype(jnp.float32)).astype(dt)
        target_lengths = jnp.floor(code_len.astype(jnp.float32) * 1.72).astype(jnp.int32)
        # xlens=code_len: the nearest grid must use the VALID code count, not
        # the padded bucket width (reference interpolates exact tensors,
        # infer_v2.py:846-849)
        cond = self.s2mel.apply(
            sp, s_infer, target_lengths, target_len, code_len, method=S2Mel.regulate
        )
        B = cond.shape[0]
        cat_cond = jnp.concatenate(
            [
                jnp.broadcast_to(
                    prompt_condition.astype(dt),
                    (B,) + prompt_condition.shape[1:],
                ),
                cond.astype(dt),
            ],
            axis=1,
        )
        # per-sequence valid frames (batched segments share the prompt)
        x_lens = ref_mel_len + target_lengths
        prompt_x = jnp.zeros((B, self.cfg.s2mel.dit.in_channels, total_len))
        ref_b = jnp.broadcast_to(ref_mel, (B,) + ref_mel.shape[1:])
        prompt_x = jax.lax.dynamic_update_slice(prompt_x, ref_b, (0, 0, 0))
        vc = cfm_inference(
            self.s2mel,
            sp,
            cat_cond,
            x_lens,
            prompt_x,
            ref_mel_len,
            jnp.broadcast_to(style, (B,) + style.shape[1:]),
            noise,
            n_steps=self.cfg.runtime.diffusion_steps,
            cfg_rate=self.cfg.runtime.cfg_rate,
            dtype=dt,
        )
        return vc

    def _vocode(self, p_bigvgan, mel):
        return self.bigvgan.apply({"params": p_bigvgan}, mel)

    def _vocode_pcm16(self, p_bigvgan, mel):
        """Vocoder + on-device PCM16 quantization (reference semantics:
        torch.clamp(32767*wav, -32767, 32767).type(int16), infer_v2.py:866).
        Halves the device->host waveform transfer — significant under the
        axon tunnel's ~20 MB/s d2h — and removes the host-side requantize."""
        wav = self.bigvgan.apply({"params": p_bigvgan}, mel)
        return jnp.clip(wav * 32767.0, -32767.0, 32767.0).astype(jnp.int16)

    def _vocode_f32(self, p_bigvgan, mel):
        return self.bigvgan_f32.apply({"params": p_bigvgan}, mel)

    def _vocode_pcm16_f32(self, p_bigvgan, mel):
        wav = self.bigvgan_f32.apply({"params": p_bigvgan}, mel)
        return jnp.clip(wav * 32767.0, -32767.0, 32767.0).astype(jnp.int16)

    # ------------------------------------------------------------------
    # conditioning extraction (infer_v2.py:618-666)
    # ------------------------------------------------------------------

    def prepare_speaker(
        self, audio: np.ndarray, sr: int, cache_key: Optional[str] = None
    ) -> SpeakerConditioning:
        if cache_key is not None and cache_key in self._spk_cache:
            return self._spk_cache[cache_key]
        # max 15 s (infer_v2.py:628)
        audio = audio[: 15 * sr]
        audio_16k = audio_utils.resample(audio, sr, 16000)
        audio_22k = audio_utils.resample(audio, sr, 22050)

        features, mask = feat.seamless_features(audio_16k)
        cond_emb = self._w2v_program(self.p_w2vbert, jnp.asarray(features), jnp.asarray(mask), self.semantic_mean, self.semantic_std)
        cond_len = int(mask.sum())

        _, s_ref = self._quantize_program(self.p_repcodec, cond_emb)

        ref_mel = mel_ops.mel_spectrogram(
            jnp.asarray(audio_22k[None]), self.cfg.s2mel.mel
        )
        ref_mel_len = ref_mel.shape[2]

        fb = feat.campplus_fbank(audio_16k)
        fb = fb - fb.mean(axis=0, keepdims=True)
        style = self._campplus_program(self.p_campplus, jnp.asarray(fb[None]))

        prompt_condition = length_regulate(
            self.s2mel,
            {"params": self.p_s2mel},
            s_ref,
            jnp.asarray([ref_mel_len]),
            ref_mel_len,
        )

        spk_latents = self._conds_program(self.p_gpt, cond_emb, jnp.asarray([cond_len]))

        out = SpeakerConditioning(
            spk_cond_emb=cond_emb,
            cond_len=cond_len,
            style=style,
            prompt_condition=prompt_condition,
            ref_mel=ref_mel,
            ref_mel_len=ref_mel_len,
            spk_latents=spk_latents,
        )
        if cache_key is not None:
            self._spk_cache[cache_key] = out
        return out

    def prepare_emotion(
        self, audio: np.ndarray, sr: int, cache_key: Optional[str] = None
    ) -> EmotionConditioning:
        if cache_key is not None and cache_key in self._emo_cache:
            return self._emo_cache[cache_key]
        audio = audio[: 15 * sr]
        audio_16k = audio_utils.resample(audio, sr, 16000)
        features, mask = feat.seamless_features(audio_16k)
        cond_emb = self._w2v_program(self.p_w2vbert, jnp.asarray(features), jnp.asarray(mask), self.semantic_mean, self.semantic_std)
        out = EmotionConditioning(emo_cond_emb=cond_emb, cond_len=int(mask.sum()))
        if cache_key is not None:
            self._emo_cache[cache_key] = out
        return out

    # ------------------------------------------------------------------
    # emotion vector mixing (infer_v2.py:668-679, 756-758)
    # ------------------------------------------------------------------

    def _emovec_from_matrix(
        self, emo_vector: Sequence[float], style: jnp.ndarray, use_random: bool
    ) -> np.ndarray:
        weights = np.asarray(emo_vector, np.float32)
        style_np = np.asarray(style)[0]
        rows = []
        for k, (emo_m, spk_m) in enumerate(zip(self.emo_matrix, self.spk_matrix)):
            if use_random:
                idx = np.random.randint(0, len(emo_m))
            else:
                sims = (spk_m @ style_np) / (
                    np.linalg.norm(spk_m, axis=1) * np.linalg.norm(style_np) + 1e-8
                )
                idx = int(np.argmax(sims))
            rows.append(emo_m[idx])
        mat = np.stack(rows)  # (8, 1024)
        return (weights[:, None] * mat).sum(0)[None]  # (1, 1024)

    @staticmethod
    def normalize_emo_vec(emo_vector: Sequence[float], apply_bias: bool = True):
        """infer_v2.py:524-538."""
        v = list(emo_vector)
        if apply_bias:
            bias = [0.9375, 0.875, 1.0, 1.0, 0.9375, 0.9375, 0.6875, 0.5625]
            v = [x * b for x, b in zip(v, bias)]
        s = sum(v)
        if s > 0.8:
            v = [x * 0.8 / s for x in v]
        return v

    # ------------------------------------------------------------------
    # synthesis
    # ------------------------------------------------------------------

    def synthesize_segment(
        self,
        spk: SpeakerConditioning,
        emo: EmotionConditioning,
        text_ids: np.ndarray,
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        use_random: bool = False,
        max_mel_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        seed: Optional[int] = None,
        num_beams: Optional[int] = None,
        do_sample: Optional[bool] = None,
        length_penalty: Optional[float] = None,
        cond_kv_key: Optional[tuple] = None,
    ) -> SegmentResult:
        emovec, codes_trimmed, t_gpt_gen = self._decode_segment_codes(
            spk, emo, text_ids, emo_alpha=emo_alpha, emo_vector=emo_vector,
            use_random=use_random, max_mel_tokens=max_mel_tokens,
            temperature=temperature, top_p=top_p, seed=seed,
            num_beams=num_beams, do_sample=do_sample,
            length_penalty=length_penalty, cond_kv_key=cond_kv_key,
        )
        return self._finish_from_codes(
            spk, emovec, text_ids, codes_trimmed, seed, t_gpt_gen
        )

    def _decode_segment_codes(
        self,
        spk: SpeakerConditioning,
        emo: EmotionConditioning,
        text_ids: np.ndarray,
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        use_random: bool = False,
        max_mel_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        seed: Optional[int] = None,
        num_beams: Optional[int] = None,
        do_sample: Optional[bool] = None,
        length_penalty: Optional[float] = None,
        cond_kv_key: Optional[tuple] = None,
    ) -> Tuple[jnp.ndarray, np.ndarray, float]:
        """The AR half of synthesize_segment: conditioning merge + GPT decode,
        ending at the host-materialized trimmed code row. Split out so the
        sequential serving path can overlap segment k's cascade tail
        (_finish_from_codes) with segment k+1's decode (see infer_generator) —
        the same stall the continuous batcher's tail_workers removed
        (reference analog: the accel engine overlapping host/device work,
        accel/accel_engine.py:567-607). Returns (emovec, codes, gpt_gen_s)."""
        rt = self.cfg.runtime
        max_new = max_mel_tokens or rt.max_mel_tokens
        t0 = time.perf_counter()

        # (emovec, conds) are a pure function of the conditioning key; for
        # keyable inputs (fixed-speaker serving) skip the two per-segment
        # program dispatches — through a tunneled TPU each dispatch has
        # fixed round-trip cost even when the compute is trivial
        cached = (
            self._emoconds_cache.get(cond_kv_key)
            if cond_kv_key is not None
            else None
        )
        if cached is not None:
            emovec, conds = cached
        else:
            # emotion vector
            emovec = self._emovec_program(
                self.p_gpt,
                spk.spk_cond_emb,
                emo.emo_cond_emb,
                jnp.asarray([spk.cond_len]),
                jnp.asarray([emo.cond_len]),
                jnp.asarray(emo_alpha, jnp.float32),
            )
            if emo_vector is not None:
                mat_vec = self._emovec_from_matrix(emo_vector, spk.style, use_random)
                # project through emovec_layer+emo_layer happens inside matrix
                # bank already (feat2.pt rows are post-projection vectors);
                # blend:
                weight_sum = float(np.sum(emo_vector))
                emovec = jnp.asarray(mat_vec) + (1.0 - weight_sum) * emovec

            conds = self._build_conds_program(self.p_gpt, spk.spk_latents, emovec)
            if cond_kv_key is not None:
                if len(self._emoconds_cache) >= 8:
                    evict_one(self._emoconds_cache)
                self._emoconds_cache[cond_kv_key] = (emovec, conds)

        # text bucket
        n = len(text_ids)
        if self.precise:
            bucket = n
        else:
            bucket = next_bucket(n, 16, 16)
            bucket = min(bucket, self.cfg.gpt.max_text_tokens)
        # text-prefix reuse requires LEFT-aligned prompts (shared prefixes
        # land on request-independent window slots)
        reuse_text = (
            rt.text_prefix_reuse
            and cond_kv_key is not None
            and self.decoder.supports_cond_kv
        )
        ids, pos, valid = self.decoder.build_text_prompt_arrays(
            np.asarray(text_ids)[None], np.asarray([n]), bucket,
            align="left" if reuse_text else "right",
        )
        if seed is not None:
            key = jax.random.PRNGKey(seed)
        else:
            with self._rng_lock:
                self._rng, key = jax.random.split(self._rng)

        # route by (do_sample, num_beams) exactly like the reference HF path
        # (infer_v2.py:714-776): num_beams>1 -> beam search (multinomial when
        # do_sample, deterministic otherwise); num_beams==1 -> sampling loop
        nb = num_beams if num_beams is not None else rt.num_beams
        ds = do_sample if do_sample is not None else rt.do_sample
        temp = temperature if temperature is not None else rt.temperature
        tp = top_p if top_p is not None else rt.top_p
        # per-speaker conds-prefix KV reuse (float and int8 layouts; only the
        # Pallas blocked/transposed layouts re-prefill — supports_cond_kv),
        # extended to cross-request TEXT-prefix reuse when enabled
        cond_kv = None
        if reuse_text:
            cond_kv = self._lookup_text_prefix(cond_kv_key, conds, text_ids)
        if (cond_kv is None and cond_kv_key is not None
                and self.decoder.supports_cond_kv):
            cond_kv = self._cond_kv_cache.get(cond_kv_key)
            if cond_kv is None:
                cond_kv = self.decoder.cond_prefill(
                    {"params": self.p_gpt}, conds
                )
                if len(self._cond_kv_cache) >= 8:  # bounded (serving)
                    evict_one(self._cond_kv_cache)
                self._cond_kv_cache[cond_kv_key] = cond_kv
        if nb > 1:
            res = self.decoder.generate_beam(
                {"params": self.p_gpt},
                conds,
                jnp.asarray(ids),
                jnp.asarray(pos),
                jnp.asarray(valid),
                max_new=max_new,
                num_beams=nb,
                repetition_penalty=rt.repetition_penalty,
                length_penalty=(
                    length_penalty if length_penalty is not None else rt.length_penalty
                ),
                do_sample=ds,
                key=key if ds else None,
                temperature=temp,
                top_p=tp,
                cond_kv=cond_kv,
            )
        else:
            res = self.decoder.generate(
                {"params": self.p_gpt},
                conds,
                jnp.asarray(ids),
                jnp.asarray(pos),
                jnp.asarray(valid),
                key,
                max_new=max_new,
                temperature=temp,
                top_p=tp,
                repetition_penalty=rt.repetition_penalty,
                cond_kv=cond_kv,
            )
        codes_np = np.asarray(res.codes)
        n_codes = int(np.asarray(res.lengths)[0])
        t_gpt_gen = time.perf_counter() - t0
        return emovec, codes_np[0, :n_codes], t_gpt_gen

    def _finish_from_codes(
        self,
        spk: SpeakerConditioning,
        emovec,
        text_ids: np.ndarray,
        codes_trimmed: np.ndarray,
        seed: Optional[int],
        t_gpt_gen: float,
    ) -> SegmentResult:
        """Latent pass + s2mel + vocoder for one decoded segment (everything
        after the AR loop; shared by the sequential path and the continuous
        batcher)."""
        rt = self.cfg.runtime
        n = len(text_ids)
        # trim at stop; optionally compress long silent-token runs (the
        # reference v2 defines remove_long_silence at infer_v2.py:410-465 but
        # its live path only stop-trims at :789-807 — see RuntimeConfig)
        codes_row, code_len = self.remove_long_silence(
            codes_trimmed,
            self.cfg.gpt.stop_mel_token,
            compress=rt.remove_long_silence,
        )
        code_len = max(code_len, 1)

        # latent pass (teacher forced) ------------------------------------
        t1 = time.perf_counter()
        code_bucket = code_len if self.precise else next_bucket(code_len, 64, 64)
        codes_arr = np.full((1, code_bucket), self.cfg.gpt.stop_mel_token, np.int32)
        n_copy = min(code_len, len(codes_row))
        codes_arr[0, :n_copy] = codes_row[:n_copy]  # 0: stop-only row
        # text bucketed (pads are masked out inside forward_latent, so this
        # is numerically the exact-shape pass); keeps the latent program's
        # compile keys on a small (text_bucket, code_bucket) grid instead of
        # one program per novel text length. Coarser than the decode prompt's
        # 16-step buckets: pad positions only waste prefill FLOPs here (they
        # never enter a decode cache), and the coarse grid is what makes
        # precompile() tractable.
        if self.precise:
            text_bucket = n
        else:
            text_bucket = min(
                next_bucket(n, 64, 64), self.cfg.gpt.max_text_tokens
            )
        text_arr = np.zeros((1, text_bucket), np.int32)
        text_arr[0, :n] = np.asarray(text_ids)[:n]
        latent = self._latent_program(
            self.p_gpt,
            spk.spk_latents,
            jnp.asarray(text_arr),
            jnp.asarray([n]),
            jnp.asarray(codes_arr),
            jnp.asarray([code_len]),
            emovec,
        )
        # stage barriers under TARS_STAGE_SYNC=1: without them the async
        # dispatch queue smears each stage's wait into the NEXT stage's
        # wall clock (the vocoder's np.asarray was absorbing the s2mel
        # wait); normal runs stay fully async
        sync = os.environ.get("TARS_STAGE_SYNC", "0") == "1"
        if sync:
            self._force(latent)
        t_gpt_fwd = time.perf_counter() - t1

        # s2mel -----------------------------------------------------------
        t2 = time.perf_counter()
        target_len_exact = int(code_len * 1.72)
        target_len = (
            target_len_exact if self.precise else next_bucket(target_len_exact, 128, 128)
        )
        total_len = spk.ref_mel_len + target_len
        if seed is not None:
            nkey = jax.random.PRNGKey(seed + 1)
        else:
            with self._rng_lock:
                self._rng, nkey = jax.random.split(self._rng)
        if getattr(self, "_noise_hook", None) is not None:
            # test/parity hook: inject externally-generated CFM noise (e.g.
            # the reference's torch.randn draw, flow_matching.py:52)
            noise = jnp.asarray(
                self._noise_hook((1, self.cfg.s2mel.dit.in_channels, total_len))
            )
        else:
            # draw noise at a canonical (bucket-independent) width and slice,
            # so precise and bucketed modes consume identical noise per frame
            noise_len = spk.ref_mel_len + next_bucket(target_len_exact, 128, 128)
            noise = jax.random.normal(
                nkey, (1, self.cfg.s2mel.dit.in_channels, noise_len), jnp.float32
            )[:, :, :total_len]
        vc = self._s2mel_program(
            self.p_s2mel,
            self.p_repcodec,
            latent[:, :code_bucket],
            jnp.asarray(codes_arr),
            jnp.asarray([code_len]),
            spk.prompt_condition,
            spk.ref_mel,
            jnp.asarray(spk.ref_mel_len),
            spk.style,
            noise,
            target_len=target_len,
            total_len=total_len,
        )
        mel_out = vc[:, :, spk.ref_mel_len : spk.ref_mel_len + target_len_exact]
        if getattr(self, "_mel_taps", None) is not None:
            self._mel_taps.append(np.asarray(mel_out))  # parity-test capture
        if sync:
            self._force(vc)
        t_s2mel = time.perf_counter() - t2

        # vocoder ---------------------------------------------------------
        t3 = time.perf_counter()
        if not self.precise:
            pad_frames = target_len - target_len_exact
            if pad_frames:
                mel_out = jnp.pad(
                    mel_out,
                    ((0, 0), (0, 0), (0, pad_frames)),
                    constant_values=float(np.log(1e-5)),
                )
        # B=1 always vocodes fp32 (the measured single-stream optimum; the
        # bf16 copy serves the batched path only)
        if self.cfg.runtime.device_pcm16:
            wav = self._vocoder_pcm16_f32_program(self.p_bigvgan_f32, mel_out)
            wav = np.asarray(wav)[0].astype(np.float32) / 32767.0
        else:
            wav = self._vocoder_f32_program(self.p_bigvgan_f32, mel_out)
            wav = np.asarray(wav)[0]
        wav = wav[: target_len_exact * self.cfg.vocoder.total_upsample]
        t_voc = time.perf_counter() - t3

        return SegmentResult(
            wav=wav.astype(np.float32),
            codes_len=code_len,
            gpt_gen_time=t_gpt_gen,
            gpt_forward_time=t_gpt_fwd,
            s2mel_time=t_s2mel,
            bigvgan_time=t_voc,
        )

    @staticmethod
    def _force(x) -> None:
        """Synchronize on a device value by reducing to a scalar and pulling
        it to host (block_until_ready is unreliable through the axon tunnel;
        a scalar d2h is an unambiguous barrier). Only used under
        TARS_STAGE_SYNC=1 profiling — normal runs stay fully async."""
        float(jnp.sum(x.astype(jnp.float32)))

    def synthesize_segments_batched(
        self,
        spk: SpeakerConditioning,
        emo: EmotionConditioning,
        segments: List[np.ndarray],
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        use_random: bool = False,
        max_mel_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        seed: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Decode ALL segments of a request concurrently (batched AR loop +
        batched latent/s2mel/vocoder) — the continuous-batching analog of the
        accel engine's multi-sequence decode (accel_engine.py:444-500).
        Like the reference accel engine, this path is pure temperature
        sampling and ignores num_beams (model_v2.py:871-883 routes to accel
        only for single sequences; accel has no beam support).
        Returns per-segment waveforms in input order."""
        rt = self.cfg.runtime
        max_new = max_mel_tokens or rt.max_mel_tokens
        B = len(segments)
        if B == 1:
            r = self.synthesize_segment(
                spk, emo, segments[0], emo_alpha=emo_alpha,
                emo_vector=emo_vector, use_random=use_random,
                max_mel_tokens=max_mel_tokens, temperature=temperature,
                top_p=top_p, seed=seed,
            )
            return [r.wav]

        emovec = self._emovec_program(
            self.p_gpt, spk.spk_cond_emb, emo.emo_cond_emb,
            jnp.asarray([spk.cond_len]), jnp.asarray([emo.cond_len]),
            jnp.asarray(emo_alpha, jnp.float32),
        )
        if emo_vector is not None:
            mat_vec = self._emovec_from_matrix(emo_vector, spk.style, use_random)
            emovec = jnp.asarray(mat_vec) + (1.0 - float(np.sum(emo_vector))) * emovec
        conds = self._build_conds_program(self.p_gpt, spk.spk_latents, emovec)
        conds_b = jnp.repeat(conds, B, axis=0)

        lens = np.asarray([len(s) for s in segments])
        bucket = int(lens.max()) if self.precise else min(
            next_bucket(int(lens.max()), 16, 16), self.cfg.gpt.max_text_tokens
        )
        text = np.zeros((B, bucket), np.int32)
        for b, seg in enumerate(segments):
            text[b, : len(seg)] = seg
        ids, pos, valid = self.decoder.build_text_prompt_arrays(text, lens, bucket)
        if seed is not None:
            key = jax.random.PRNGKey(seed)
        else:
            with self._rng_lock:
                self._rng, key = jax.random.split(self._rng)
        # per-stage wall clocks; only meaningful with TARS_STAGE_SYNC=1 (each
        # stage then synchronizes before the next timestamp — profiling mode;
        # default leaves dispatch async and the table shows dispatch skew)
        sync = os.environ.get("TARS_STAGE_SYNC", "0") == "1"
        tstage: Dict[str, float] = {}
        t_mark = time.perf_counter()

        def mark(name, value=None):
            nonlocal t_mark
            if sync and value is not None:
                self._force(value)
            now = time.perf_counter()
            tstage[name] = tstage.get(name, 0.0) + (now - t_mark)
            t_mark = now

        res = self.decoder.generate(
            {"params": self.p_gpt}, conds_b,
            jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid), key,
            max_new=max_new,
            temperature=temperature if temperature is not None else rt.temperature,
            top_p=top_p if top_p is not None else rt.top_p,
            repetition_penalty=rt.repetition_penalty,
        )
        codes_np = np.asarray(res.codes)
        lengths = np.asarray(res.lengths)
        mark("decode")
        # per-row stop trim + optional silent-run compression
        rows = [
            self.remove_long_silence(
                codes_np[b, : int(lengths[b])],
                self.cfg.gpt.stop_mel_token,
                compress=rt.remove_long_silence,
            )
            for b in range(B)
        ]
        code_lens = np.maximum([r[1] for r in rows], 1)
        Lm = int(code_lens.max())
        code_bucket = Lm if self.precise else next_bucket(Lm, 64, 64)
        codes_arr = np.full((B, code_bucket), self.cfg.gpt.stop_mel_token, np.int32)
        for b in range(B):
            n = min(code_lens[b], len(rows[b][0]))
            codes_arr[b, :n] = rows[b][0][:n]  # n==0: stop-only row

        # latent-pass text uses the coarse 64-step grid (pads masked inside
        # forward_latent), sharing compile keys with the sequential path
        lat_bucket = bucket if self.precise else min(
            next_bucket(int(lens.max()), 64, 64), self.cfg.gpt.max_text_tokens
        )
        lat_text = np.zeros((B, lat_bucket), np.int32)
        for b, seg in enumerate(segments):
            lat_text[b, : len(seg)] = seg
        mark("host_trim")
        latent = self._latent_program(
            self.p_gpt,
            jnp.repeat(spk.spk_latents, B, axis=0),
            jnp.asarray(lat_text), jnp.asarray(lens),
            jnp.asarray(codes_arr), jnp.asarray(code_lens),
            jnp.repeat(emovec, B, axis=0) if emovec.shape[0] == 1 else emovec,
        )
        mark("latent", latent)

        target_exact = (code_lens * 1.72).astype(np.int64)
        target_len = int(target_exact.max()) if self.precise else next_bucket(
            int(target_exact.max()), 128, 128
        )
        total_len = spk.ref_mel_len + target_len
        if seed is not None:
            nkey = jax.random.PRNGKey(seed + 1)
        else:
            with self._rng_lock:
                self._rng, nkey = jax.random.split(self._rng)
        noise_len = spk.ref_mel_len + next_bucket(int(target_exact.max()), 128, 128)
        noise = jax.random.normal(
            nkey, (B, self.cfg.s2mel.dit.in_channels, noise_len), jnp.float32
        )[:, :, :total_len]
        vc = self._s2mel_program(
            self.p_s2mel, self.p_repcodec,
            latent, jnp.asarray(codes_arr), jnp.asarray(code_lens),
            spk.prompt_condition, spk.ref_mel, jnp.asarray(spk.ref_mel_len),
            spk.style, noise, target_len=target_len, total_len=total_len,
        )
        mark("s2mel", vc)
        mel_out = vc[:, :, spk.ref_mel_len : spk.ref_mel_len + target_len]
        # silence-fill the padded frames so conv leakage stays inaudible
        frame_idx = np.arange(target_len)
        mel_np_mask = jnp.asarray(
            (frame_idx[None, :] < target_exact[:, None])[:, None, :]
        )
        mel_out = jnp.where(mel_np_mask, mel_out, float(np.log(1e-5)))
        if self.cfg.runtime.device_pcm16:
            wavs = np.asarray(
                self._vocoder_pcm16_program(self.p_bigvgan, mel_out)
            ).astype(np.float32) / 32767.0
        else:
            wavs = np.asarray(self._vocoder_program(self.p_bigvgan, mel_out))
        mark("vocoder")
        self._last_batched_stats = dict(tstage)
        up = self.cfg.vocoder.total_upsample
        return [
            wavs[b, : int(target_exact[b]) * up].astype(np.float32)
            for b in range(B)
        ]

    def precompile(
        self,
        spk: SpeakerConditioning,
        emo: Optional[EmotionConditioning] = None,
        *,
        text_buckets: Optional[Sequence[int]] = None,
        max_code_len: int = 512,
        max_new: Optional[int] = None,
        num_beams: Optional[int] = None,
        do_sample: Optional[bool] = None,
        workers: int = 4,
        block: bool = True,
        code_lens: Optional[Sequence[int]] = None,
        decode_variants: str = "both",
    ):
        """Compile the serving envelope's jitted programs up front, in
        parallel threads (tracing holds the GIL; the XLA compiles run
        concurrently in C++).

        The reference pays one torch.compile warmup synthesis and then
        recompiles lazily per dynamic shape (serve_tars.py:143-199). Here
        every program's compile key lives on a small bucket grid — decode
        prompt width (16-step), latent-pass text (64-step) x codes (64-step),
        s2mel target frames (128-step) — so the whole grid up to
        `max_code_len` codes can be compiled before (or while) traffic
        arrives, and no request inside the envelope ever hits a compile
        stall. Shapes outside the envelope still compile on demand.

        code_lens: restrict the (code, target) combo grid to exactly the
        code lengths given instead of the whole [1, max_code_len] envelope —
        a known-shape caller (bench warmup, fixed-length serving) compiles
        one combo instead of ~15. decode_variants: "both" compiles the
        keyed (cond-KV reuse) and raw decode traces; "keyed"/"raw" compile
        just one (they are distinct XLA programs; halves the warmup pole
        when the caller knows its route); "keyed" falls back to the raw
        trace when the decoder's cache layout has no cond-KV reuse (the
        route the engine would actually take there); "none" skips decode
        entirely — continuous-mode serving decodes through the batcher's
        own programs but still runs this engine's cascade tail, so the
        latent/s2mel/vocoder grid is worth warming alone.

        Returns the number of programs compiled.
        """
        rt = self.cfg.runtime
        if emo is None:
            emo = EmotionConditioning(spk.spk_cond_emb, spk.cond_len)
        mn = max_new or rt.max_mel_tokens
        nb = rt.num_beams if num_beams is None else num_beams
        ds = rt.do_sample if do_sample is None else do_sample
        mt = self.cfg.gpt.max_text_tokens
        if text_buckets is None:
            cap_t = min(
                next_bucket(rt.max_text_tokens_per_segment, 16, 16), mt
            )
            text_buckets = list(range(16, cap_t + 1, 16))
        text_buckets = sorted({min(int(b), mt) for b in text_buckets})

        # warms emovec/build_conds too (cheap, serial)
        emovec = self._emovec_program(
            self.p_gpt, spk.spk_cond_emb, emo.emo_cond_emb,
            jnp.asarray([spk.cond_len]), jnp.asarray([emo.cond_len]),
            jnp.asarray(1.0, jnp.float32),
        )
        conds = self._build_conds_program(self.p_gpt, spk.spk_latents, emovec)

        # the serving decode route (synthesize_segment): beam when nb>1,
        # else the sampling loop; both reuse the conds-prefix KV when the
        # layout supports it
        cond_kv = None
        if (self.decoder.supports_cond_kv
                and decode_variants not in ("raw", "none")):
            cond_kv = self.decoder.cond_prefill({"params": self.p_gpt}, conds)
        if decode_variants != "none":
            self.decoder.ensure_beam_jit()

        # (code_bucket, target_bucket) combos actually reachable from
        # code_len in [1, max_code_len] (one code bucket can map to two
        # target buckets across its code_len range)
        combos = {}
        for cl in (range(1, max_code_len + 1) if code_lens is None
                   else [int(c) for c in code_lens]):
            cb = next_bucket(cl, 64, 64)
            tb = next_bucket(int(cl * 1.72), 128, 128)
            combos.setdefault((cb, tb), cl)
        lat_buckets = sorted(
            {min(next_bucket(b, 64, 64), mt) for b in text_buckets}
        )
        code_buckets = sorted({cb for cb, _ in combos})
        target_buckets = sorted({tb for _, tb in combos})
        D = self.cfg.gpt.model_dim

        def decode_job(bucket):
            # compile BOTH reuse variants: keyable speakers (serving) hit the
            # cond_kv trace, raw-array speakers hit the monolithic one
            ids, pos, valid = self.decoder.build_text_prompt_arrays(
                np.ones((1, bucket), np.int32), np.asarray([bucket]), bucket
            )
            k = jax.random.PRNGKey(0)
            variants = []
            if decode_variants in ("both", "raw") or (
                decode_variants == "keyed" and cond_kv is None
            ):
                variants.append(None)
            if cond_kv is not None:
                variants.append(cond_kv)
            for ckv in variants:
                if nb > 1:
                    self.decoder.generate_beam(
                        {"params": self.p_gpt}, conds,
                        jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
                        max_new=mn, num_beams=nb, do_sample=ds,
                        key=k if ds else None, cond_kv=ckv,
                    )
                else:
                    self.decoder.generate(
                        {"params": self.p_gpt}, conds,
                        jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
                        k, max_new=mn, cond_kv=ckv,
                    )

        def latent_job(tb64, cb):
            self._latent_program(
                self.p_gpt, spk.spk_latents,
                jnp.zeros((1, tb64), jnp.int32), jnp.asarray([tb64]),
                jnp.full((1, cb), self.cfg.gpt.stop_mel_token, jnp.int32),
                jnp.asarray([cb]), emovec,
            )

        def s2mel_job(cb, tb, cl):
            total = spk.ref_mel_len + tb
            self._s2mel_program(
                self.p_s2mel, self.p_repcodec,
                jnp.zeros((1, cb, D), jnp.float32),
                jnp.full((1, cb), self.cfg.gpt.stop_mel_token, jnp.int32),
                jnp.asarray([cl]),
                spk.prompt_condition, spk.ref_mel,
                jnp.asarray(spk.ref_mel_len), spk.style,
                jnp.zeros(
                    (1, self.cfg.s2mel.dit.in_channels, total), jnp.float32
                ),
                target_len=tb, total_len=total,
            )

        def vocoder_job(tb):
            # the sequential serving path vocodes B=1 through the fp32 program
            mel = jnp.full(
                (1, self.cfg.s2mel.dit.in_channels, tb),
                float(np.log(1e-5)), jnp.float32,
            )
            if rt.device_pcm16:
                self._vocoder_pcm16_f32_program(self.p_bigvgan_f32, mel)
            else:
                self._vocoder_f32_program(self.p_bigvgan_f32, mel)

        jobs = (
            ([] if decode_variants == "none"
             else [functools.partial(decode_job, b) for b in text_buckets])
            + [
                functools.partial(latent_job, tb64, cb)
                for tb64 in lat_buckets
                for cb in code_buckets
            ]
            + [
                functools.partial(s2mel_job, cb, tb, cl)
                for (cb, tb), cl in sorted(combos.items())
            ]
            + [functools.partial(vocoder_job, tb) for tb in target_buckets]
        )
        if workers <= 1:
            for j in jobs:
                j()
            return len(jobs)
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=workers)
        futs = [pool.submit(j) for j in jobs]
        if block:
            for f in futs:
                f.result()
            pool.shutdown()
        else:
            pool.shutdown(wait=False)
        return len(jobs)

    # text-prefix reuse grid: prefixes are cached at multiples of this many
    # tokens (the reference's analog is its 256-token block size; a finer
    # grid fits typical TTS segment lengths)
    TEXT_PREFIX_GRAN = 32

    def _lookup_text_prefix(self, cond_kv_key, conds, text_ids):
        """Longest-prefix chained-hash lookup of a cached
        [conds][start][text[:m]] KV; on miss, prefill and cache the longest
        grid prefix of this text so future requests sharing it skip its
        prefill (reference: KVCacheManager.allocate chained hashes,
        accel/kv_manager.py:130-165)."""
        import hashlib

        g = self.TEXT_PREFIX_GRAN
        text = np.asarray(text_ids, np.int32)
        m_max = (len(text) // g) * g
        if m_max < g:
            return None
        for m in range(m_max, g - 1, -g):
            key = (
                cond_kv_key, m,
                hashlib.sha256(text[:m].tobytes()).hexdigest(),
            )
            hit = self._text_prefix_cache.get(key)
            if hit is not None:
                return hit
        kv = self.decoder.text_prefix_prefill(
            {"params": self.p_gpt}, conds, text[:m_max]
        )
        if len(self._text_prefix_cache) >= 8:  # bounded (~16 MB/entry)
            evict_one(self._text_prefix_cache)
        self._text_prefix_cache[
            (cond_kv_key, m_max,
             hashlib.sha256(text[:m_max].tobytes()).hexdigest())
        ] = kv
        return kv

    def infer_text(
        self,
        spk_audio: Union[str, Tuple[np.ndarray, int]],
        text: str,
        max_text_tokens_per_segment: Optional[int] = None,
        use_emo_text: bool = False,
        emo_text: Optional[str] = None,
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        quick_streaming_tokens: int = 0,
        **kwargs,
    ):
        """Text-level API: normalize + tokenize + split segments, then infer.
        Requires a tokenizer (engine ctor arg).

        use_emo_text: derive the 8-dim emotion vector from `emo_text` (or the
        main text) with the Qwen emotion model (infer_v2.py:591-598); needs
        `self.qwen_emo` to be attached (see runtime/qwen_emo.py)."""
        if self.tokenizer is None:
            raise ValueError("engine has no tokenizer; pass pre-tokenized segments to infer()")
        if use_emo_text:
            qe = getattr(self, "qwen_emo", None)
            if qe is None:
                raise ValueError("use_emo_text requires engine.qwen_emo")
            emo_dict = qe.inference(emo_text if emo_text is not None else text)
            emo_vector = list(emo_dict.values())
        if emo_vector is not None:
            # pre-scale by alpha (infer_v2.py:600-608)
            scale = max(0.0, min(1.0, emo_alpha))
            if scale != 1.0:
                emo_vector = [int(x * scale * 10000) / 10000 for x in emo_vector]
            emo_alpha = 1.0
        max_seg = max_text_tokens_per_segment or self.cfg.runtime.max_text_tokens_per_segment
        pieces = self.tokenizer.tokenize(text)
        # quick_streaming_tokens>0: emit small early segments until that many
        # tokens are out (first-chunk latency lever; infer_v2.py:573,700)
        segments = self.tokenizer.split_segments(
            pieces, max_seg, quick_streaming_tokens=quick_streaming_tokens
        )
        seg_ids = [
            np.asarray(self.tokenizer.convert_tokens_to_ids(s), np.int32)
            for s in segments
        ]
        return self.infer(
            spk_audio, seg_ids, emo_alpha=emo_alpha, emo_vector=emo_vector, **kwargs
        )

    @staticmethod
    def remove_long_silence(
        codes: np.ndarray, stop_token: int, silent_token: int = 52,
        max_consecutive: int = 30, compress: bool = True,
    ) -> Tuple[np.ndarray, int]:
        """infer_v2.py:410-465 / infer.py:147 (v1 live call sites :450,:639):
        trim at the first stop token; if compress and the sequence contains
        more than `max_consecutive` silent tokens total, keep at most 10
        consecutive ones. Returns (trimmed codes (T',), length)."""
        code = codes
        stop_idx = np.nonzero(code == stop_token)[0]
        length = int(stop_idx[0]) if len(stop_idx) else len(code)
        code = code[:length]
        if compress and int(np.sum(code == silent_token)) > max_consecutive:
            keep = []
            run = 0
            for k in range(length):
                if code[k] != silent_token:
                    keep.append(k)
                    run = 0
                elif run < 10:
                    keep.append(k)
                    run += 1
            code = code[keep]
        return code, len(code)

    def infer_generator(
        self,
        spk_audio: Union[str, Tuple[np.ndarray, int]],
        text_ids_segments: List[np.ndarray],
        emo_audio: Optional[Union[str, Tuple[np.ndarray, int]]] = None,
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        use_random: bool = False,
        interval_silence: int = 200,
        seed: Optional[int] = None,
        **gen_kwargs,
    ) -> Generator[np.ndarray, None, None]:
        """Streaming synthesis: yields per-segment waveforms then the
        inter-segment silence (infer_v2.py:874-879 stream_return semantics)."""
        if isinstance(spk_audio, str):
            audio, sr = audio_utils.load_wav(spk_audio)
            spk = self.prepare_speaker(audio, sr, cache_key=spk_audio)
            spk_key = spk_audio
        else:
            spk = self.prepare_speaker(*spk_audio)
            spk_key = None
        if emo_vector is not None:
            emo_audio = None
        if emo_audio is None:
            emo = EmotionConditioning(spk.spk_cond_emb, spk.cond_len)
            emo_alpha = 1.0
            emo_key = ""
        elif isinstance(emo_audio, str):
            audio, sr = audio_utils.load_wav(emo_audio)
            emo = self.prepare_emotion(audio, sr, cache_key=emo_audio)
            emo_key = emo_audio
        else:
            emo = self.prepare_emotion(*emo_audio)
            emo_key = None
        # same keyable-conditioning reuse as infer(): fixed-speaker serving
        # streams skip the per-segment emovec/conds dispatches and re-use the
        # conds-prefix KV across segments and requests
        cond_kv_key = None
        if spk_key is not None and emo_key is not None and not use_random:
            cond_kv_key = (
                spk_key, emo_key, float(emo_alpha),
                tuple(emo_vector) if emo_vector is not None else None,
            )

        sr_out = self.cfg.runtime.sampling_rate
        sil = np.zeros(int(sr_out * interval_silence / 1000.0), np.float32)
        if self._seq_tail_overlap_enabled(len(text_ids_segments)):
            # pipelined default: segment k's cascade tail (latent -> s2mel ->
            # vocoder -> blocking PCM d2h, ~0.33 s sync'd of a 0.80 s segment
            # wall) runs on a tail thread while segment k+1 decodes (~0.47 s)
            # on the producer thread; waveforms still yield strictly in order.
            # Seeded requests are waveform-identical to the inline path
            # (tests/test_engine_e2e.py); seedless requests consume the
            # engine rng stream in a different (thread-interleaved) order.
            for r in self._pipelined_segments(
                spk, emo, text_ids_segments, emo_alpha=emo_alpha,
                emo_vector=emo_vector, use_random=use_random, seed=seed,
                cond_kv_key=cond_kv_key, **gen_kwargs,
            ):
                yield r.wav
                if interval_silence > 0:
                    yield sil
            return
        for i, seg in enumerate(text_ids_segments):
            r = self.synthesize_segment(
                spk, emo, np.asarray(seg),
                emo_alpha=emo_alpha, emo_vector=emo_vector, use_random=use_random,
                seed=None if seed is None else seed + i,
                cond_kv_key=cond_kv_key, **gen_kwargs,
            )
            yield r.wav
            if interval_silence > 0:
                yield sil

    def _seq_tail_overlap_enabled(self, n_segments: int) -> bool:
        """Tail overlap engages for multi-segment sequential requests; it is
        disabled under TARS_STAGE_SYNC=1 (the stage barriers it would overlap
        are the point of that mode)."""
        return (
            self.cfg.runtime.seq_tail_overlap
            and n_segments > 1
            and os.environ.get("TARS_STAGE_SYNC", "0") != "1"
        )

    def _pipelined_segments(
        self,
        spk: SpeakerConditioning,
        emo: EmotionConditioning,
        text_ids_segments: List[np.ndarray],
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        use_random: bool = False,
        seed: Optional[int] = None,
        cond_kv_key: Optional[tuple] = None,
        **gen_kwargs,
    ) -> Generator[SegmentResult, None, None]:
        """Decode/tail pipeline over a segment list: a producer thread runs
        the AR decode for segment k+1 while a single tail worker (FIFO, so
        results complete in submission order) finishes segment k; yields
        SegmentResults strictly in segment order.

        The handoff queue is BOUNDED (depth 2): a slow streaming consumer
        (client at playback rate) applies backpressure to the producer, so
        at most ~3 segments of audio are in flight per request — the 1-deep
        decode/tail overlap needs no more, and an unbounded queue would let
        one slow client buffer a whole long request's waveforms in host
        memory while monopolizing the chip against concurrent requests."""
        import queue
        from concurrent.futures import ThreadPoolExecutor

        tail_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="tars-seq-tail"
        )
        out_q: "queue.Queue[tuple]" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def put(item) -> bool:
            """Blocking put that aborts when the consumer is gone (the
            generator's finally sets `stop`; a plain put could deadlock
            against the bounded queue)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for i, seg in enumerate(text_ids_segments):
                    if stop.is_set():
                        break
                    seg = np.asarray(seg)
                    s_i = None if seed is None else seed + i
                    emovec, codes, t_gen = self._decode_segment_codes(
                        spk, emo, seg, emo_alpha=emo_alpha,
                        emo_vector=emo_vector, use_random=use_random,
                        seed=s_i, cond_kv_key=cond_kv_key, **gen_kwargs,
                    )
                    if not put((
                        "fut",
                        tail_pool.submit(
                            self._finish_from_codes,
                            spk, emovec, seg, codes, s_i, t_gen,
                        ),
                    )):
                        return
                put(("done", None))
            except BaseException as e:  # surface decode errors to the consumer
                put(("err", e))

        th = threading.Thread(
            target=producer, daemon=True, name="tars-seq-decode"
        )
        th.start()
        try:
            while True:
                kind, v = out_q.get()
                if kind == "done":
                    break
                if kind == "err":
                    raise v
                yield v.result()
        finally:
            stop.set()
            tail_pool.shutdown(wait=True)
            th.join(timeout=60)

    def infer_generator_continuous(
        self,
        service,
        spk_audio: Union[str, Tuple[np.ndarray, int]],
        text_ids_segments: List[np.ndarray],
        emo_audio: Optional[Union[str, Tuple[np.ndarray, int]]] = None,
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        interval_silence: int = 200,
        seed: Optional[int] = None,
        timeout: float = 600.0,
    ) -> Generator[np.ndarray, None, None]:
        """Streaming synthesis through a shared ContinuousService: all
        segments are submitted up front (they batch with other requests'
        segments in the shared AR loop) and yielded in order as they
        complete — streaming TTFB = first segment completion, not the whole
        request (serve.py /tts/stream under TARS_CONTINUOUS_SLOTS>1)."""
        if isinstance(spk_audio, str):
            audio, sr = audio_utils.load_wav(spk_audio)
            spk = self.prepare_speaker(audio, sr, cache_key=spk_audio)
        else:
            spk = self.prepare_speaker(*spk_audio)
        if emo_vector is not None:
            emo_audio = None
        if emo_audio is None:
            emo = EmotionConditioning(spk.spk_cond_emb, spk.cond_len)
            emo_alpha = 1.0
        elif isinstance(emo_audio, str):
            audio, sr = audio_utils.load_wav(emo_audio)
            emo = self.prepare_emotion(audio, sr, cache_key=emo_audio)
        else:
            emo = self.prepare_emotion(*emo_audio)
        futs = [
            service.submit(
                spk, emo, np.asarray(seg), emo_alpha=emo_alpha,
                emo_vector=emo_vector,
                seed=None if seed is None else seed + i,
                priority=i,  # breadth-first admission: every request's first
                             # segment beats any request's later segments
            )
            for i, seg in enumerate(text_ids_segments)
        ]
        sr_out = self.cfg.runtime.sampling_rate
        sil = np.zeros(int(sr_out * interval_silence / 1000.0), np.float32)
        for f in futs:
            yield f.result(timeout=timeout).wav
            if interval_silence > 0:
                yield sil

    def infer(
        self,
        spk_audio: Union[str, Tuple[np.ndarray, int]],
        text_ids_segments: List[np.ndarray],
        emo_audio: Optional[Union[str, Tuple[np.ndarray, int]]] = None,
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        use_random: bool = False,
        interval_silence: int = 200,
        output_path: Optional[str] = None,
        seed: Optional[int] = None,
        batched: bool = False,
        **gen_kwargs,
    ):
        """Batch (non-streaming) synthesis over pre-tokenized segments.
        batched=True decodes all segments concurrently in one AR loop.
        Returns (sample_rate, waveform float32) and optionally writes a WAV."""
        start = time.perf_counter()
        if isinstance(spk_audio, str):
            audio, sr = audio_utils.load_wav(spk_audio)
            spk = self.prepare_speaker(audio, sr, cache_key=spk_audio)
            spk_key = spk_audio
        else:
            spk = self.prepare_speaker(*spk_audio)
            spk_key = None

        if emo_vector is not None:
            emo_audio = None  # vector mode overrides audio (infer_v2.py:586-589)
        if emo_audio is None:
            emo = EmotionConditioning(spk.spk_cond_emb, spk.cond_len)
            emo_alpha = 1.0
            emo_key = ""
        elif isinstance(emo_audio, str):
            audio, sr = audio_utils.load_wav(emo_audio)
            emo = self.prepare_emotion(audio, sr, cache_key=emo_audio)
            emo_key = emo_audio
        else:
            emo = self.prepare_emotion(*emo_audio)
            emo_key = None

        # prefix-KV reuse only when both conditionings are keyable (file-path
        # inputs, i.e. the serving deployment's fixed-speaker case); a random
        # emo_vector draw (use_random) is never reusable
        cond_kv_key = None
        if spk_key is not None and emo_key is not None and not use_random:
            cond_kv_key = (
                spk_key, emo_key, float(emo_alpha),
                tuple(emo_vector) if emo_vector is not None else None,
            )

        wavs = []
        stats = []
        if batched and len(text_ids_segments) > 1:
            # the batched AR loop is sampling-only; like the reference's accel
            # batch engine it ignores num_beams/do_sample (model_v2.py:871-883)
            bkw = {k: v for k, v in gen_kwargs.items()
                   if k not in ("num_beams", "do_sample")}
            wavs = self.synthesize_segments_batched(
                spk, emo, [np.asarray(s) for s in text_ids_segments],
                emo_alpha=emo_alpha, emo_vector=emo_vector,
                use_random=use_random, seed=seed, **bkw,
            )
        elif self._seq_tail_overlap_enabled(len(text_ids_segments)):
            # default sequential route, pipelined: tail k overlaps decode k+1
            for r in self._pipelined_segments(
                spk, emo, text_ids_segments, emo_alpha=emo_alpha,
                emo_vector=emo_vector, use_random=use_random, seed=seed,
                cond_kv_key=cond_kv_key, **gen_kwargs,
            ):
                wavs.append(r.wav)
                stats.append(r)
        else:
            for i, seg in enumerate(text_ids_segments):
                r = self.synthesize_segment(
                    spk,
                    emo,
                    np.asarray(seg),
                    emo_alpha=emo_alpha,
                    emo_vector=emo_vector,
                    use_random=use_random,
                    seed=None if seed is None else seed + i,
                    cond_kv_key=cond_kv_key,
                    **gen_kwargs,
                )
                wavs.append(r.wav)
                stats.append(r)

        sr_out = self.cfg.runtime.sampling_rate
        sil = np.zeros(int(sr_out * interval_silence / 1000.0), np.float32)
        pieces = []
        for i, w in enumerate(wavs):
            pieces.append(w)
            if i < len(wavs) - 1:
                pieces.append(sil)
        wav = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)

        total = time.perf_counter() - start
        dur = len(wav) / sr_out
        rtf = total / dur if dur > 0 else float("inf")
        if output_path:
            audio_utils.save_wav(output_path, wav, sr_out)
        return {
            "sampling_rate": sr_out,
            "audio": wav,
            "duration_sec": dur,
            "rtf": rtf,
            "stats": stats,
        }

    def infer_continuous(
        self,
        service,
        spk_audio: Union[str, Tuple[np.ndarray, int]],
        text_ids_segments: List[np.ndarray],
        emo_audio: Optional[Union[str, Tuple[np.ndarray, int]]] = None,
        emo_alpha: float = 1.0,
        emo_vector: Optional[Sequence[float]] = None,
        interval_silence: int = 200,
        seed: Optional[int] = None,
        timeout: float = 600.0,
    ):
        """infer() via a shared ContinuousService: segments (and segments of
        OTHER concurrent requests) batch dynamically in one AR loop. Same
        return contract as infer()."""
        start = time.perf_counter()
        if isinstance(spk_audio, str):
            audio, sr = audio_utils.load_wav(spk_audio)
            spk = self.prepare_speaker(audio, sr, cache_key=spk_audio)
        else:
            spk = self.prepare_speaker(*spk_audio)
        if emo_vector is not None:
            emo_audio = None
        if emo_audio is None:
            emo = EmotionConditioning(spk.spk_cond_emb, spk.cond_len)
            emo_alpha = 1.0
        elif isinstance(emo_audio, str):
            audio, sr = audio_utils.load_wav(emo_audio)
            emo = self.prepare_emotion(audio, sr, cache_key=emo_audio)
        else:
            emo = self.prepare_emotion(*emo_audio)

        futs = [
            service.submit(
                spk, emo, np.asarray(seg), emo_alpha=emo_alpha,
                emo_vector=emo_vector,
                seed=None if seed is None else seed + i,
                priority=i,
            )
            for i, seg in enumerate(text_ids_segments)
        ]
        stats = [f.result(timeout=timeout) for f in futs]
        wavs = [r.wav for r in stats]

        sr_out = self.cfg.runtime.sampling_rate
        sil = np.zeros(int(sr_out * interval_silence / 1000.0), np.float32)
        pieces = []
        for i, w in enumerate(wavs):
            pieces.append(w)
            if i < len(wavs) - 1:
                pieces.append(sil)
        wav = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
        total = time.perf_counter() - start
        dur = len(wav) / sr_out
        return {
            "sampling_rate": sr_out,
            "audio": wav,
            "duration_sec": dur,
            "rtf": total / dur if dur > 0 else float("inf"),
            "stats": stats,
        }


# ---------------------------------------------------------------------------
# construction helpers
# ---------------------------------------------------------------------------


def random_params(cfg: IndexTTS2Config, seed: int = 0, fast: bool = True) -> Dict[str, Any]:
    """Random-initialized params for every model (dev/bench without ckpts).

    fast=True: resolve shapes with jax.eval_shape, fill with host numpy
    (no device traffic — flax init on a tunneled TPU is minutes-slow).
    seed=None: constant fill (instant; for pure throughput benchmarking)."""
    if fast:
        # eval_shape traces every model init (~2 min for the full config);
        # cache the resolved shapes on disk keyed by the config
        import hashlib
        import pickle

        key = hashlib.sha256(repr(cfg).encode()).hexdigest()[:16]
        cache_file = f"/tmp/indextts_tpu_shapes_{key}.pkl"
        shapes = None
        try:
            with open(cache_file, "rb") as f:
                raw = pickle.load(f)
            shapes = jax.tree_util.tree_map(
                lambda sd: jax.ShapeDtypeStruct(sd[0], np.dtype(sd[1])),
                raw,
                is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2
                and isinstance(x[1], str),
            )
        except (OSError, pickle.PickleError, EOFError):
            pass
        if shapes is None:
            shapes = jax.eval_shape(lambda: random_params(cfg, 0, fast=False))
            try:
                raw = jax.tree_util.tree_map(
                    lambda s: (tuple(s.shape), np.dtype(s.dtype).name), shapes
                )
                with open(cache_file, "wb") as f:
                    pickle.dump(raw, f)
            except OSError:
                pass
        rng = np.random.default_rng(seed) if seed is not None else None

        def fill(leaf):
            if rng is None:
                return np.full(leaf.shape, 0.02, dtype=leaf.dtype)
            # strictly positive values: BatchNorm variance leaves must be > 0
            v = rng.random(leaf.shape, dtype=np.float32) * 0.04 + 0.01
            return v.astype(leaf.dtype)

        return jax.tree_util.tree_map(fill, shapes)

    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    gpt = UnifiedVoice(cfg.gpt)
    s2mel = S2Mel(cfg.s2mel)
    bigvgan = BigVGAN(cfg.vocoder)
    repcodec = RepCodec(cfg.semantic_codec)
    campplus = CAMPPlus(cfg.campplus)
    w2vbert = W2VBertEncoder(cfg.w2vbert)

    d = cfg.gpt.model_dim
    p_gpt = gpt.init(
        ks[0],
        jnp.zeros((1, 32, d)),
        jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([4]),
        jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([4]),
        jnp.zeros((1, d)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    # conditioning branches are separate methods; init them too and merge
    p_cond = gpt.init(
        ks[1], jnp.zeros((1, 8, 1024)), jnp.asarray([8]),
        method=UnifiedVoice.get_conditioning,
    )["params"]
    p_emo = gpt.init(
        ks[2], jnp.zeros((1, 8, 1024)), jnp.asarray([8]),
        method=UnifiedVoice.get_emovec,
    )["params"]
    p_head = gpt.init(
        ks[2], jnp.zeros((1, d)), method=UnifiedVoice.mel_logits_from_hidden
    )["params"]
    for src in (p_cond, p_emo, p_head):
        for k2, v in src.items():
            p_gpt.setdefault(k2, v)

    mel_ch = cfg.s2mel.dit.in_channels
    p_s2mel = s2mel.init(
        ks[3],
        jnp.zeros((1, mel_ch, 16)),
        jnp.zeros((1, mel_ch, 16)),
        jnp.asarray([16]),
        jnp.zeros((1,)),
        jnp.zeros((1, cfg.s2mel.dit.style_dim)),
        jnp.zeros((1, 16, cfg.s2mel.dit.content_dim)),
        method=S2Mel.velocity,
    )["params"]
    p_lr = s2mel.init(
        ks[3], jnp.zeros((1, 8, cfg.s2mel.length_regulator.in_channels)),
        jnp.asarray([8]), 8, method=S2Mel.regulate,
    )["params"]
    p_gl = s2mel.init(
        ks[3], jnp.zeros((1, 4, cfg.s2mel.gpt_dims[0])), method=S2Mel.project_gpt_latent
    )["params"]
    for src in (p_lr, p_gl):
        for k2, v in src.items():
            p_s2mel.setdefault(k2, v)

    p_bigvgan = bigvgan.init(ks[4], jnp.zeros((1, cfg.vocoder.num_mels, 8)))["params"]
    p_rep = repcodec.init(
        ks[5], jnp.zeros((1, 8, cfg.semantic_codec.hidden_size)), method=RepCodec.quantize
    )["params"]
    p_camp = campplus.init(ks[5], jnp.zeros((1, 240, cfg.campplus.feat_dim)))["params"]
    p_w2v = w2vbert.init(
        ks[5],
        jnp.zeros((1, 8, cfg.w2vbert.feature_projection_input_dim)),
        jnp.ones((1, 8), jnp.int32),
    )["params"]

    return {
        "gpt": p_gpt,
        "s2mel": p_s2mel,
        "bigvgan": p_bigvgan,
        "repcodec": p_rep,
        "campplus": p_camp,
        "w2vbert": p_w2v,
    }
