"""QwenEmotion: text -> 8-dim emotion vector via the fine-tuned Qwen3-0.6B.

Parity target: infer_v2.py:948-1063 — chat-template prompt ("文本情感分类"
system message), greedy generation, </think> stripping, JSON parsing with a
regex fallback, the melancholic-word swap workaround, score clamping to
[0, 1.2], and calm fallback.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional


CN_KEY_TO_EN = {
    "高兴": "happy",
    "愤怒": "angry",
    "悲伤": "sad",
    "恐惧": "afraid",
    "反感": "disgusted",
    "低落": "melancholic",
    "惊讶": "surprised",
    "自然": "calm",
}
DESIRED_ORDER = ["高兴", "愤怒", "悲伤", "恐惧", "反感", "低落", "惊讶", "自然"]
MELANCHOLIC_WORDS = {
    "低落", "melancholy", "melancholic", "depression", "depressed", "gloomy",
}
THINK_END_TOKEN_ID = 151668  # </think>


class QwenEmotion:
    """Wraps a generate function: prompt_text -> response_text."""

    def __init__(self, generate_fn, prompt: str = "文本情感分类",
                 max_score: float = 1.2, min_score: float = 0.0):
        self.generate_fn = generate_fn
        self.prompt = prompt
        self.max_score = max_score
        self.min_score = min_score

    def clamp_score(self, v: float) -> float:
        return max(self.min_score, min(self.max_score, v))

    def convert(self, content: Dict[str, float]) -> Dict[str, float]:
        emotion_dict = {
            CN_KEY_TO_EN[k]: self.clamp_score(content.get(k, 0.0))
            for k in DESIRED_ORDER
        }
        if all(v <= 0.0 for v in emotion_dict.values()):
            emotion_dict["calm"] = 1.0
        return emotion_dict

    @staticmethod
    def parse_response(content: str) -> Dict[str, float]:
        try:
            return json.loads(content)
        except json.JSONDecodeError:
            return {
                m.group(1): float(m.group(2))
                for m in re.finditer(r'([^\s":.,]+?)"?\s*:\s*([\d.]+)', content)
            }

    def inference(self, text_input: str) -> Dict[str, float]:
        content_str = self.generate_fn(self.prompt, text_input)
        content = self.parse_response(content_str)
        text_lower = text_input.lower()
        if any(w in text_lower for w in MELANCHOLIC_WORDS):
            content["悲伤"], content["低落"] = (
                content.get("低落", 0.0),
                content.get("悲伤", 0.0),
            )
        return self.convert(content)

    def vector(self, text_input: str) -> List[float]:
        return list(self.inference(text_input).values())


def strip_thinking(output_ids: List[int]) -> List[int]:
    """Drop everything up to and including the last </think> (infer_v2.py:1033-1038)."""
    try:
        idx = len(output_ids) - output_ids[::-1].index(THINK_END_TOKEN_ID)
    except ValueError:
        idx = 0
    return output_ids[idx:]


def build_qwen_emotion(model_dir: str, max_new_tokens: int = 256) -> QwenEmotion:
    """Build a QwenEmotion over the fine-tuned Qwen3-0.6B checkpoint dir
    (reference `qwen0.6bemo4-merge/`): HF tokenizer (chat template with
    enable_thinking=False) + our flax Qwen3 LM + jitted greedy decode."""
    from pathlib import Path

    from transformers import AutoTokenizer

    from indextts_tpu.config import QwenEmoConfig
    from indextts_tpu.models.qwen3 import Qwen3LM, greedy_generate
    from indextts_tpu.runtime.torch_convert import convert_qwen3

    tokenizer = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
    cfg = QwenEmoConfig(max_new_tokens=max_new_tokens)
    model = Qwen3LM(cfg)

    d = Path(model_dir)
    sfts = sorted(d.glob("*.safetensors"))
    if sfts:
        from safetensors.numpy import load_file

        sd = {}
        for f in sfts:
            sd.update(load_file(str(f)))
    else:
        import torch

        sd_t = torch.load(d / "pytorch_model.bin", map_location="cpu")
        sd = {k: v.float().numpy() for k, v in sd_t.items()}
    import jax

    params = jax.device_put({"params": convert_qwen3(sd, cfg)})
    eos = tokenizer.eos_token_id

    def generate_fn(system_prompt: str, user_text: str) -> str:
        text = tokenizer.apply_chat_template(
            [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": user_text},
            ],
            tokenize=False,
            add_generation_prompt=True,
            enable_thinking=False,
        )
        ids = tokenizer([text], return_tensors="np")["input_ids"][0]
        out = greedy_generate(model, params, ids, max_new_tokens, eos)
        out = strip_thinking(list(out))
        return tokenizer.decode(out, skip_special_tokens=True)

    return QwenEmotion(generate_fn)
