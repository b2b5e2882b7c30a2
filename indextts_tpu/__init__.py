"""indextts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) zero-shot TTS framework
with the capabilities of IndexTTS2 + the TARS serving stack.

Layer map (mirrors SURVEY.md §1 of the reference, re-designed TPU-first):

  frontend/   text normalization, BPE tokenization, segment splitting
  ops/        Pallas kernels + XLA compute primitives (STFT/mel, snake,
              flash/paged attention, resampling)
  models/     pure-functional flax model definitions (GPT "UnifiedVoice",
              conformer/perceiver conditioning, w2v-BERT, RepCodec,
              CAMPPlus, s2mel DiT+CFM, BigVGAN)
  runtime/    jitted inference programs (prefill/decode loops, CFM solver,
              vocoder), orchestration engine, serving, checkpoints
  parallel/   device mesh + sharding specs (DP over hosts, TP over ICI)
"""

from indextts_tpu.config import IndexTTS2Config, load_config

__version__ = "0.1.0"

__all__ = ["IndexTTS2Config", "load_config", "__version__"]
