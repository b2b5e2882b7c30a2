"""UnifiedVoice: the autoregressive GPT acoustic-token model, in flax.

Parity target: indextts/gpt/model_v2.py:338-910 (IndexTTS2 v2 UnifiedVoice).
Structure:
  * conformer+perceiver speaker conditioning -> 32 latents @ model_dim
    (get_conditioning, model_v2.py:627-663)
  * conformer+perceiver emotion conditioning -> 1 latent @ 1024
    (get_emo_conditioning, model_v2.py:665-671), projected by
    emovec_layer (1024->1280) then emo_layer (1280->1280)
  * duration/speed embedding prepended as 2 tokens (model_v2.py:706-709)
  * GPT-2 core (24L x 1280d x 20h) over [conds(34)][text][mel]
  * learned mel/text position embeddings (LearnedPositionEmbeddings)
  * final_norm + mel_head for logits; teacher-forced forward returns latents
    (model_v2.py:673-723)

The decode loop itself lives in runtime/decode.py; this module exposes the
pure functions the loop needs (prompt embedding assembly, step embedding,
logits head) so the whole AR generation compiles into one XLA program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from indextts_tpu.config import GPTConfig
from indextts_tpu.models.conformer import ConformerEncoder
from indextts_tpu.models.gpt2 import GPT2Core
from indextts_tpu.models.perceiver import PerceiverResampler


class UnifiedVoice(nn.Module):
    cfg: GPTConfig
    dtype: Any = jnp.float32
    # W8A8 int8 GPT blocks (params via runtime.torch_convert.quantize_gpt_tree)
    quantize_gpt: bool = False
    # decode attention implementation: "xla" | "pallas_ragged"
    attn_impl: str = "xla"
    pallas_interpret: bool = False
    # int8 KV cache for decode (halves decode HBM traffic; see models/gpt2.py
    # quantize_kv). Sampling path only.
    kv_quant: bool = False
    # "pallas": B=1 decode GEMV/MLP via the streaming int8 kernels (ops/gemv)
    gemv_impl: str = "xla"
    # int8 logits head (gpt2.QuantDenseHead, lane-padded vocab): removes the
    # last unquantized per-step weight stream. Params via
    # torch_convert.quantize_gpt_tree(head=True).
    head_quant: bool = False
    # quantized weight bits for the GPT blocks: 8 (W8A8) or 4 (W4A8 packed
    # nibbles; params via quantize_gpt_tree(bits=4))
    wbits: int = 8

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
        self.emo_conditioning_encoder = ConformerEncoder(
            c.emo_condition_module, self.dtype, name="emo_conditioning_encoder"
        )
        self.emo_perceiver_encoder = PerceiverResampler(
            dim=1024,
            dim_context=c.emo_condition_module.output_size,
            num_latents=1,
            heads=c.emo_condition_module.attention_heads,
            ff_mult=c.emo_condition_module.perceiver_mult,
            dtype=self.dtype,
            name="emo_perceiver_encoder",
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
        self.speed_emb = nn.Embed(2, c.model_dim, name="speed_emb")
        self.emovec_layer = nn.Dense(c.model_dim, name="emovec_layer")
        self.emo_layer = nn.Dense(c.model_dim, name="emo_layer")
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
        self.gpt = GPT2Core(c.layers, c.heads, self.dtype, self.quantize_gpt, self.attn_impl, self.pallas_interpret, self.kv_quant, gemv_impl=self.gemv_impl, wbits=self.wbits, name="gpt")

    # ------------------------------------------------------------------
    # Conditioning
    # ------------------------------------------------------------------

    def get_conditioning(self, cond_emb: jnp.ndarray, cond_lens: jnp.ndarray):
        """(B, T, 1024) w2v-BERT features -> (B, 32, model_dim) latents.
        Mirrors model_v2.py:636-643 (conformer_perceiver branch)."""
        enc, mask = self.conditioning_encoder(cond_emb, cond_lens)
        # cond_mask_pad: prepend num_latents True slots (model_v2.py:381,641)
        lat_true = jnp.ones(
            (mask.shape[0], self.cfg.condition_num_latent), dtype=bool
        )
        conds_mask = jnp.concatenate([lat_true, mask], axis=1)
        return self.perceiver_encoder(enc, conds_mask)

    def get_emo_conditioning(self, cond_emb: jnp.ndarray, cond_lens: jnp.ndarray):
        """(B, T, 1024) -> (B, 1024). Mirrors model_v2.py:665-671."""
        enc, mask = self.emo_conditioning_encoder(cond_emb, cond_lens)
        lat_true = jnp.ones((mask.shape[0], 1), dtype=bool)
        conds_mask = jnp.concatenate([lat_true, mask], axis=1)
        conds = self.emo_perceiver_encoder(enc, conds_mask)
        return conds[:, 0]

    def get_emovec(self, emo_cond_emb: jnp.ndarray, emo_cond_lens: jnp.ndarray):
        """model_v2.py:897-902: raw emotion vec -> projected model_dim vec."""
        e = self.get_emo_conditioning(emo_cond_emb, emo_cond_lens)
        return self.emo_layer(self.emovec_layer(e))

    def merge_emovec(
        self,
        spk_cond_emb: jnp.ndarray,
        emo_cond_emb: jnp.ndarray,
        spk_lens: jnp.ndarray,
        emo_lens: jnp.ndarray,
        alpha: float = 1.0,
    ):
        """model_v2.py:904-910: base + alpha * (emo - base)."""
        emo = self.get_emovec(emo_cond_emb, emo_lens)
        base = self.get_emovec(spk_cond_emb, spk_lens)
        return base + alpha * (emo - base)

    def build_conds_latent(self, spk_latents: jnp.ndarray, emovec: jnp.ndarray):
        """[spk_latents + emovec, speed_emb(1), speed_emb(0)] -> (B, 34, D).
        Mirrors model_v2.py:706-709 / 830-834 (use_speed=0 inference default:
        the *last* duration token is speed_emb(0))."""
        B = spk_latents.shape[0]
        dur0 = self.speed_emb(jnp.zeros((B, 1), dtype=jnp.int32))
        dur1 = self.speed_emb(jnp.ones((B, 1), dtype=jnp.int32))
        return jnp.concatenate(
            [spk_latents + emovec[:, None, :], dur1, dur0], axis=1
        )

    # ------------------------------------------------------------------
    # Prompt / step embeddings for the decode loop
    # ------------------------------------------------------------------

    def embed_text_prompt(
        self,
        text_ids: jnp.ndarray,
        text_pos: jnp.ndarray,
        text_valid: jnp.ndarray,
    ):
        """Right-aligned text ids -> embeddings, zeroed on left-pad slots.

        text_ids:  (B, L) right-aligned [pad..][start][tokens][stop]
        text_pos:  (B, L) position indices (0-based from the start token)
        text_valid:(B, L) bool, False on pad slots
        """
        emb = self.text_embedding(text_ids) + self.text_pos_embedding(text_pos)
        return jnp.where(text_valid[..., None], emb, 0.0)

    def embed_mel_start(self, batch: int):
        """start_mel_token embedding at mel position 0 (GPT2InferenceModel
        embeds the first decoded position with text_pos_embedding(=mel pos)
        index 0, model_v2.py:163-165)."""
        tok = jnp.full((batch, 1), self.cfg.start_mel_token, dtype=jnp.int32)
        pos = jnp.zeros((batch, 1), dtype=jnp.int32)
        return self.mel_embedding(tok) + self.mel_pos_embedding(pos)

    def embed_mel_step(self, tokens: jnp.ndarray, step: jnp.ndarray):
        """Embed one decode-step token at mel position `step + 2`.

        Position parity with the reference decode path: GPT2InferenceModel
        uses get_fixed_embedding(attention_mask.len - prompt_len)
        (model_v2.py:174-177), which for the k-th generated token (k>=0)
        evaluates to k + 2 (position 1 is skipped — a quirk we replicate).
        """
        emb = self.mel_embedding(tokens[:, None])
        pos = jnp.broadcast_to(step + 2, (tokens.shape[0],))[:, None]
        return emb + self.mel_pos_embedding(pos)

    def mel_logits_from_hidden(self, hidden: jnp.ndarray):
        """lm_head = final_norm o mel_head, applied on top of the GPT's ln_f
        output (GPT2InferenceModel composes both, model_v2.py:63)."""
        return self.mel_head(self.final_norm(hidden.astype(jnp.float32)))

    def gpt_prefill(self, inputs_embeds: jnp.ndarray, attention_mask: jnp.ndarray):
        return self.gpt(inputs_embeds, attention_mask)

    def gpt_decode_step(
        self,
        token_embeds: jnp.ndarray,
        kv_caches,
        cache_index,
        kv_valid_len,
        attention_mask,
        prefix_limit=None,
    ):
        return self.gpt(
            token_embeds,
            attention_mask,
            kv_caches=kv_caches,
            cache_index=cache_index,
            kv_valid_len=kv_valid_len,
            prefix_limit=prefix_limit,
        )

    # ------------------------------------------------------------------
    # Training forward: text + mel logits with aligned targets
    # (the objective implied by get_logits, model_v2.py:597-625; the
    # reference ships no training loop — this is ours)
    # ------------------------------------------------------------------

    def forward_train(
        self,
        spk_latents: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_lens: jnp.ndarray,
        mel_codes: jnp.ndarray,
        mel_lens: jnp.ndarray,
        emovec: jnp.ndarray,
    ):
        """Returns (text_logits, mel_logits, text_targets, mel_targets),
        logits (B, L, V); targets are the right-shifted aligned sequences."""
        c = self.cfg
        B, Lt = text_ids.shape
        Lm = mel_codes.shape[1]

        pos_t = jnp.arange(Lt)
        text_ids = jnp.where(
            pos_t[None] < text_lens[:, None], text_ids, c.stop_text_token
        )
        text_inp = jnp.concatenate(
            [
                jnp.full((B, 1), c.start_text_token, jnp.int32),
                text_ids.astype(jnp.int32),
                jnp.full((B, 1), c.stop_text_token, jnp.int32),
            ],
            axis=1,
        )
        text_tar = jnp.concatenate(
            [
                text_ids.astype(jnp.int32),
                jnp.full((B, 2), c.stop_text_token, jnp.int32),
            ],
            axis=1,
        )
        pos_m = jnp.arange(Lm)
        mel_codes = jnp.where(
            pos_m[None] < mel_lens[:, None], mel_codes, c.stop_mel_token
        )
        mel_inp = jnp.concatenate(
            [
                jnp.full((B, 1), c.start_mel_token, jnp.int32),
                mel_codes.astype(jnp.int32),
                jnp.full((B, 1), c.stop_mel_token, jnp.int32),
            ],
            axis=1,
        )
        mel_tar = jnp.concatenate(
            [
                mel_codes.astype(jnp.int32),
                jnp.full((B, 2), c.stop_mel_token, jnp.int32),
            ],
            axis=1,
        )

        text_emb = self.text_embedding(text_inp) + self.text_pos_embedding(
            jnp.arange(Lt + 2)[None]
        )
        mel_emb = self.mel_embedding(mel_inp) + self.mel_pos_embedding(
            jnp.arange(Lm + 2)[None]
        )
        conds = self.build_conds_latent(spk_latents, emovec)
        emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)
        hidden, _ = self.gpt(emb)
        offset = conds.shape[1]
        enc = self.final_norm(hidden[:, offset:].astype(jnp.float32))
        text_logits = self.text_head(enc[:, : Lt + 2])
        mel_logits = self.mel_head(enc[:, -(Lm + 2):])
        return text_logits, mel_logits, text_tar, mel_tar

    # ------------------------------------------------------------------
    # Teacher-forced latent pass (model_v2.py:673-723)
    # ------------------------------------------------------------------

    def forward_latent(
        self,
        spk_latents: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_lens: jnp.ndarray,
        mel_codes: jnp.ndarray,
        mel_lens: jnp.ndarray,
        emovec: jnp.ndarray,
    ):
        """Full-sequence pass returning GPT latents for the mel positions.

        text_ids: (B, Lt) raw segment token ids (no start/stop)
        mel_codes: (B, Lm) generated codes (stop-trimmed)
        Returns (B, Lm, model_dim) — reference returns mel latents [:-2] of the
        (Lm+2)-long aligned sequence, i.e. exactly Lm positions.
        """
        c = self.cfg
        B, Lt = text_ids.shape
        Lm = mel_codes.shape[1]

        # set_text_padding (stop fill beyond length), then F.pad(0,1) stop and
        # build_aligned start -> [start][text][stop], length Lt+2
        # (model_v2.py:700-711, 564-567)
        pos_t = jnp.arange(Lt)
        text_ids = jnp.where(pos_t[None] < text_lens[:, None], text_ids, c.stop_text_token)
        text_full = jnp.concatenate(
            [
                jnp.full((B, 1), c.start_text_token, jnp.int32),
                text_ids.astype(jnp.int32),
                jnp.full((B, 1), c.stop_text_token, jnp.int32),
            ],
            axis=1,
        )  # (B, Lt+2)
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
        )  # (B, Lm+2)
        mel_emb = self.mel_embedding(mel_full) + self.mel_pos_embedding(
            jnp.arange(Lm + 2)[None]
        )

        conds = self.build_conds_latent(spk_latents, emovec)  # (B, 34, D)
        emb = jnp.concatenate([conds, text_emb, mel_emb], axis=1)
        # Key padding mask: positions beyond [start|text|stop] / [start|mel|
        # stop] are bucket fill. Masking them makes the padded forward
        # numerically EQUAL to the reference's exact-shape pass
        # (model_v2.py:816-827 runs unpadded at B=1): every valid position
        # has the same embedding and attends to the same key set, so text
        # bucketing costs nothing and mixed-length batched rows no longer
        # see one another's text pads.
        mask_t = jnp.arange(Lt + 2)[None] < (text_lens[:, None] + 2)
        mask_m = jnp.arange(Lm + 2)[None] < (mel_lens[:, None] + 2)
        mask = jnp.concatenate(
            [jnp.ones((B, conds.shape[1]), bool), mask_t, mask_m], axis=1
        )
        hidden, _ = self.gpt(emb, attention_mask=mask)
        offset = conds.shape[1]
        enc = self.final_norm(hidden[:, offset:].astype(jnp.float32))
        # mel section = last Lm+2 positions; reference returns [:, :-2] of it
        return enc[:, -(Lm + 2):][:, :Lm]
