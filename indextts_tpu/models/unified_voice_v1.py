"""UnifiedVoice v1: the IndexTTS v1 mel-conditioned AR acoustic model, flax.

Parity target: indextts/gpt/model.py:332-782 — same GPT-2 skeleton as v2 but:
  * conditioning from a 100-bin mel spectrogram (conformer input_size=100)
  * conds = 32 perceiver latents only (no emotion vector, no duration tokens)
  * forward() computes mel code lengths from wav lengths:
    ceil(wav_len / mel_length_compression) + 1 (model.py:608-610)

Reuses the v2 building blocks (ConformerEncoder, PerceiverResampler,
GPT2Core) and the same decode loop (runtime/decode.py works unchanged —
conds_latent is just 32 wide instead of 34).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from indextts_tpu.config import GPTConfig
from indextts_tpu.models.conformer import ConformerEncoder
from indextts_tpu.models.gpt2 import GPT2Core
from indextts_tpu.models.perceiver import PerceiverResampler


class UnifiedVoiceV1(nn.Module):
    cfg: GPTConfig  # with condition_module.input_size = 100
    dtype: Any = jnp.float32
    # same decode-runtime knobs as v2's UnifiedVoice (shared GPT2Core):
    # W8A8 blocks, int8 KV cache, Pallas decode attention / streaming GEMVs,
    # int8 logits head. Params via torch_convert.quantize_gpt_tree.
    quantize_gpt: bool = False
    attn_impl: str = "xla"
    pallas_interpret: bool = False
    kv_quant: bool = False
    gemv_impl: str = "xla"
    head_quant: bool = False

    def setup(self):
        c = self.cfg
        self.conditioning_encoder = ConformerEncoder(
            c.condition_module, self.dtype, name="conditioning_encoder"
        )
        self.perceiver_encoder = PerceiverResampler(
            dim=c.model_dim,
            dim_context=c.condition_module.output_size,
            num_latents=c.condition_num_latent,
            heads=c.condition_module.attention_heads,
            ff_mult=c.condition_module.perceiver_mult,
            dtype=self.dtype,
            name="perceiver_encoder",
        )
        self.text_embedding = nn.Embed(
            c.number_text_tokens + 1, c.model_dim, name="text_embedding"
        )
        self.mel_embedding = nn.Embed(
            c.number_mel_codes, c.model_dim, name="mel_embedding"
        )
        self.mel_pos_embedding = nn.Embed(
            c.max_mel_position, c.model_dim, name="mel_pos_embedding"
        )
        self.text_pos_embedding = nn.Embed(
            c.max_text_position, c.model_dim, name="text_pos_embedding"
        )
        self.final_norm = nn.LayerNorm(epsilon=1e-5, name="final_norm")
        if self.head_quant:
            from indextts_tpu.models.gpt2 import QuantDenseHead

            self.mel_head = QuantDenseHead(
                c.number_mel_codes,
                gemv=self.gemv_impl == "pallas",
                pallas_interpret=self.pallas_interpret,
                name="mel_head",
            )
        else:
            self.mel_head = nn.Dense(c.number_mel_codes, name="mel_head")
        self.text_head = nn.Dense(c.number_text_tokens + 1, name="text_head")
        self.gpt = GPT2Core(
            c.layers, c.heads, self.dtype, self.quantize_gpt, self.attn_impl,
            self.pallas_interpret, self.kv_quant, gemv_impl=self.gemv_impl,
            name="gpt",
        )

    def get_conditioning(self, cond_mel: jnp.ndarray, cond_lens: jnp.ndarray):
        """(B, T, 100) mel (frames-major) -> (B, 32, model_dim)."""
        enc, mask = self.conditioning_encoder(cond_mel, cond_lens)
        lat_true = jnp.ones((mask.shape[0], self.cfg.condition_num_latent), bool)
        conds_mask = jnp.concatenate([lat_true, mask], axis=1)
        return self.perceiver_encoder(enc, conds_mask)

    # decode-loop hooks (same contracts as v2's UnifiedVoice)
    def embed_text_prompt(self, text_ids, text_pos, text_valid):
        emb = self.text_embedding(text_ids) + self.text_pos_embedding(text_pos)
        return jnp.where(text_valid[..., None], emb, 0.0)

    def embed_mel_start(self, batch: int):
        tok = jnp.full((batch, 1), self.cfg.start_mel_token, jnp.int32)
        return self.mel_embedding(tok) + self.mel_pos_embedding(
            jnp.zeros((batch, 1), jnp.int32)
        )

    def embed_mel_step(self, tokens, step):
        emb = self.mel_embedding(tokens[:, None])
        pos = jnp.broadcast_to(step + 2, (tokens.shape[0],))[:, None]
        return emb + self.mel_pos_embedding(pos)

    def mel_logits_from_hidden(self, hidden):
        return self.mel_head(self.final_norm(hidden.astype(jnp.float32)))

    def gpt_prefill(self, inputs_embeds, attention_mask):
        return self.gpt(inputs_embeds, attention_mask)

    def gpt_decode_step(self, token_embeds, kv_caches, cache_index, kv_valid_len, attention_mask):
        return self.gpt(
            token_embeds, attention_mask, kv_caches=kv_caches,
            cache_index=cache_index, kv_valid_len=kv_valid_len,
        )

    def forward_latent(
        self,
        cond_mel: jnp.ndarray,
        cond_lens: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_lens: jnp.ndarray,
        mel_codes: jnp.ndarray,
        wav_lens: jnp.ndarray,
    ):
        """model.py:571-650 return_latent path. wav_lens in samples; mel code
        lengths = ceil(wav/compression) + 1."""
        c = self.cfg
        B, Lt = text_ids.shape
        Lm = mel_codes.shape[1]
        conds = self.get_conditioning(cond_mel, cond_lens)

        mel_lens = (
            jnp.ceil(wav_lens.astype(jnp.float32) / c.mel_length_compression)
        ).astype(jnp.int32) + 1
        pos_t = jnp.arange(Lt)
        text_ids = jnp.where(pos_t[None] < text_lens[:, None], text_ids, c.stop_text_token)
        text_full = jnp.concatenate(
            [
                jnp.full((B, 1), c.start_text_token, jnp.int32),
                text_ids.astype(jnp.int32),
                jnp.full((B, 1), c.stop_text_token, jnp.int32),
            ],
            axis=1,
        )
        text_emb = self.text_embedding(text_full) + self.text_pos_embedding(
            jnp.arange(Lt + 2)[None]
        )
        pos_m = jnp.arange(Lm)
        mel_codes = jnp.where(pos_m[None] < mel_lens[:, None], mel_codes, c.stop_mel_token)
        mel_full = jnp.concatenate(
            [
                jnp.full((B, 1), c.start_mel_token, jnp.int32),
                mel_codes.astype(jnp.int32),
                jnp.full((B, 1), c.stop_mel_token, jnp.int32),
            ],
            axis=1,
        )
        mel_emb = self.mel_embedding(mel_full) + self.mel_pos_embedding(
            jnp.arange(Lm + 2)[None]
        )
        emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)
        hidden, _ = self.gpt(emb)
        enc = self.final_norm(hidden[:, conds.shape[1]:].astype(jnp.float32))
        return enc[:, -(Lm + 2):][:, :Lm]
