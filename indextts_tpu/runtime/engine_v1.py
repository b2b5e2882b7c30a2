"""IndexTTS v1 inference engine: mel-conditioned GPT -> GPT latents -> v1
BigVGAN (latent + speaker-reference vocoder).

Parity target: indextts/infer.py IndexTTS (:37-703) including the `infer_fast`
path (:296-529): length-bucketed batched AR decode (bucket_max_size=4),
per-utterance latent pass, chunked vocoder decode. On TPU the "fast path" is
the default — batching is just a batch dimension on the jitted decode loop.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.config import GPTConfig, MelConfig
from indextts_tpu.models.bigvgan_v1 import BigVGANv1, BigVGANv1Config
from indextts_tpu.models.unified_voice_v1 import UnifiedVoiceV1
from indextts_tpu.ops import mel as mel_ops
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig
from indextts_tpu.utils import audio as audio_utils


def bucket_segments(
    seg_lens: List[int], bucket_max_size: int = 4
) -> List[List[int]]:
    """Group segment indices into decode batches of <= bucket_max_size,
    nearest lengths together (infer.py:204-260 semantics: sort by length,
    chunk)."""
    order = sorted(range(len(seg_lens)), key=lambda i: seg_lens[i])
    return [order[i : i + bucket_max_size] for i in range(0, len(order), bucket_max_size)]


class IndexTTSV1Engine:
    def __init__(
        self,
        gpt_cfg: GPTConfig,
        voc_cfg: BigVGANv1Config,
        params: Dict[str, Any],
        mel_cfg: Optional[MelConfig] = None,
        tokenizer=None,
        bucket_max_size: int = 4,
        gpt_dtype=jnp.float32,
        device_pcm16: bool = True,
        quantize_gpt: bool = False,
        kv_quant: bool = False,
        attn_impl: str = "xla",
        gemv_impl: str = "xla",
        head_quant: bool = False,
    ):
        """params: {"gpt": …, "bigvgan": …} flax trees
        (torch_convert.convert_unified_voice_v1 / convert_bigvgan_v1).

        quantize_gpt/kv_quant/attn_impl/gemv_impl/head_quant: the same
        decode-runtime knobs as the v2 engine (shared GPT2Core + decode
        loop); the v1 param tree is converted through quantize_gpt_tree."""
        self.gpt_cfg = gpt_cfg
        self.voc_cfg = voc_cfg
        # v1 conditioning mel: 24 kHz / 100 bins (config.yaml dataset.mel)
        self.mel_cfg = mel_cfg or MelConfig(
            sample_rate=24000, n_fft=1024, hop_length=256, win_length=1024, n_mels=100
        )
        self.tokenizer = tokenizer
        self.bucket_max_size = bucket_max_size

        head_quant = head_quant and quantize_gpt
        self.gpt = UnifiedVoiceV1(
            gpt_cfg, dtype=gpt_dtype, quantize_gpt=quantize_gpt,
            kv_quant=kv_quant, attn_impl=attn_impl, gemv_impl=gemv_impl,
            head_quant=head_quant,
        )
        self.bigvgan = BigVGANv1(voc_cfg)
        p_gpt_raw = params["gpt"]
        if quantize_gpt:
            from indextts_tpu.runtime.torch_convert import quantize_gpt_tree

            p_gpt_raw = quantize_gpt_tree(p_gpt_raw, head=head_quant)
        self.p_gpt = jax.device_put(p_gpt_raw)
        self.p_voc = jax.device_put(params["bigvgan"])

        self.decoder = GPTDecoder(self.gpt, gpt_cfg, SamplingConfig())
        self._cond_program = jax.jit(
            lambda p, mel, lens: self.gpt.apply(
                {"params": p}, mel, lens, method=UnifiedVoiceV1.get_conditioning
            )
        )
        self._latent_program = jax.jit(
            lambda p, mel, ml, t, tl, c, wl: self.gpt.apply(
                {"params": p}, mel, ml, t, tl, c, wl,
                method=UnifiedVoiceV1.forward_latent,
            )
        )
        # frozen at construction: the jitted program bakes this branch in
        self.device_pcm16 = bool(device_pcm16)
        pcm16 = self.device_pcm16

        def _voc(p, lat, ref):
            wav = self.bigvgan.apply({"params": p}, lat, ref)
            if pcm16:
                # reference v1 output semantics (infer.py:493 clamp + int16);
                # halves the device->host waveform transfer
                return jnp.clip(wav * 32767.0, -32767.0, 32767.0).astype(jnp.int16)
            return wav

        self._voc_program = jax.jit(_voc)
        self._cond_cache: Dict[str, Tuple[jnp.ndarray, int]] = {}
        self._rng = jax.random.PRNGKey(0)

    def prepare_conditioning(self, audio: np.ndarray, sr: int, key: Optional[str] = None):
        if key is not None and key in self._cond_cache:
            return self._cond_cache[key]
        audio24 = audio_utils.resample(audio, sr, self.mel_cfg.sample_rate)
        mel = mel_ops.mel_spectrogram_v1(jnp.asarray(audio24[None]), self.mel_cfg)
        mel_t = jnp.swapaxes(mel, 1, 2)  # (1, T, 100)
        out = (mel_t, mel_t.shape[1])
        if key is not None:
            self._cond_cache[key] = out
        return out

    def infer_fast(
        self,
        spk_audio: Union[str, Tuple[np.ndarray, int]],
        text_ids_segments: List[np.ndarray],
        output_path: Optional[str] = None,
        interval_silence: int = 200,
        max_mel_tokens: int = 600,
        seed: Optional[int] = None,
        temperature: float = 1.0,
        top_p: float = 0.8,
        repetition_penalty: float = 10.0,
    ):
        """Bucketed-batch synthesis over pre-tokenized segments."""
        t_start = time.perf_counter()
        if isinstance(spk_audio, str):
            audio, sr = audio_utils.load_wav(spk_audio)
            cond_mel, cond_len = self.prepare_conditioning(audio, sr, key=spk_audio)
        else:
            cond_mel, cond_len = self.prepare_conditioning(*spk_audio)
        conds = self._cond_program(self.p_gpt, cond_mel, jnp.asarray([cond_len]))

        seg_lens = [len(s) for s in text_ids_segments]
        wav_parts: List[Optional[np.ndarray]] = [None] * len(seg_lens)

        for batch_idx in bucket_segments(seg_lens, self.bucket_max_size):
            B = len(batch_idx)
            Lmax = max(seg_lens[i] for i in batch_idx)
            text = np.zeros((B, Lmax), np.int32)
            lens = np.zeros(B, np.int64)
            for bi, si in enumerate(batch_idx):
                text[bi, : seg_lens[si]] = text_ids_segments[si]
                lens[bi] = seg_lens[si]
            ids, pos, valid = self.decoder.build_text_prompt_arrays(text, lens, Lmax)
            if seed is not None:
                key = jax.random.PRNGKey(seed + batch_idx[0])
            else:
                self._rng, key = jax.random.split(self._rng)
            conds_b = jnp.repeat(conds, B, axis=0)
            res = self.decoder.generate(
                {"params": self.p_gpt},
                conds_b,
                jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(valid),
                key, max_new=max_mel_tokens, temperature=temperature,
                top_p=top_p, repetition_penalty=repetition_penalty,
            )
            codes = np.asarray(res.codes)
            lengths = np.asarray(res.lengths)

            # stop-trim + silent-run compression (reference v1 applies
            # remove_long_silence to every batch, infer.py:450,639)
            from indextts_tpu.runtime.engine import IndexTTS2Engine

            rows = [
                IndexTTS2Engine.remove_long_silence(
                    codes[bi, : int(lengths[bi])], self.gpt_cfg.stop_mel_token
                )
                for bi in range(B)
            ]
            code_lens = np.maximum([r[1] for r in rows], 1)
            Lm = int(code_lens.max())
            codes_arr = np.full((B, Lm), self.gpt_cfg.stop_mel_token, np.int32)
            for bi in range(B):
                n = min(code_lens[bi], len(rows[bi][0]))
                codes_arr[bi, :n] = rows[bi][0][:n]  # n==0: stop-only row
            wav_lens = code_lens * self.gpt_cfg.mel_length_compression
            latents = self._latent_program(
                self.p_gpt,
                jnp.repeat(cond_mel, B, axis=0),
                jnp.full((B,), cond_len),
                jnp.asarray(text), jnp.asarray(lens),
                jnp.asarray(codes_arr), jnp.asarray(wav_lens),
            )
            wavs = np.asarray(
                self._voc_program(
                    self.p_voc, latents, jnp.repeat(cond_mel, B, axis=0)
                )
            )
            if self.device_pcm16:
                wavs = wavs.astype(np.float32) / 32767.0
            samples_per_code = self.gpt_cfg.mel_length_compression
            for bi, si in enumerate(batch_idx):
                n = int(code_lens[bi]) * samples_per_code
                wav_parts[si] = wavs[bi, : n].astype(np.float32)

        sr_out = 24000
        sil = np.zeros(int(sr_out * interval_silence / 1000.0), np.float32)
        pieces: List[np.ndarray] = []
        for i, w in enumerate(wav_parts):
            pieces.append(w if w is not None else np.zeros(0, np.float32))
            if i < len(wav_parts) - 1:
                pieces.append(sil)
        wav = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
        total = time.perf_counter() - t_start
        dur = len(wav) / sr_out
        if output_path:
            audio_utils.save_wav(output_path, wav, sr_out)
        return {
            "sampling_rate": sr_out,
            "audio": wav,
            "duration_sec": dur,
            "rtf": total / dur if dur else float("inf"),
        }
