"""SentencePiece-model-compatible BPE tokenizer + segment splitter.

Parity target: indextts/utils/front.py TextTokenizer (:231-436), which wraps a
SentencePiece BPE model (12k vocab, config.yaml:22). The sentencepiece library
is not part of this framework; instead we parse the .model protobuf directly
(ModelProto: repeated SentencePiece {piece:1, score:2, type:3}) and implement
the BPE merge algorithm: greedy highest-score adjacent-pair merges over
▁-marked symbols.

The segment splitter replicates split_segments_by_token (front.py:344-422)
decision-for-decision: punctuation splits, comma/hyphen sub-splits, hard
length chunking, and the trailing merge loop with quick-streaming support.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple, Union

from indextts_tpu.frontend.normalize import (
    TextNormalizer,
    de_tokenize_by_cjk_char,
    tokenize_by_cjk_char,
)

# SentencePiece piece types
_NORMAL, _UNKNOWN, _CONTROL, _USER_DEFINED, _UNUSED, _BYTE = 1, 2, 3, 4, 5, 6

WORD_SEP = "▁"  # ▁


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _parse_piece(buf: bytes) -> Tuple[str, float, int]:
    pos = 0
    piece, score, ptype = "", 0.0, _NORMAL
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
            if field == 3:
                ptype = val
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            data = buf[pos : pos + ln]
            pos += ln
            if field == 1:
                piece = data.decode("utf-8", errors="replace")
        elif wt == 5:
            (val,) = struct.unpack("<f", buf[pos : pos + 4])
            pos += 4
            if field == 2:
                score = val
        elif wt == 1:
            pos += 8
        else:
            raise ValueError(f"bad wire type {wt}")
    return piece, score, ptype


def parse_sentencepiece_model(data: bytes) -> List[Tuple[str, float, int]]:
    """Parse a SentencePiece .model protobuf -> [(piece, score, type), ...]."""
    pieces = []
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wt = key >> 3, key & 7
        if wt == 2:
            ln, pos = _read_varint(data, pos)
            payload = data[pos : pos + ln]
            pos += ln
            if field == 1:  # repeated SentencePiece pieces
                pieces.append(_parse_piece(payload))
        elif wt == 0:
            _, pos = _read_varint(data, pos)
        elif wt == 5:
            pos += 4
        elif wt == 1:
            pos += 8
        else:
            raise ValueError(f"bad wire type {wt} at top level")
    return pieces


class SentencePieceBPE:
    """BPE encoder over a SentencePiece model's pieces+scores."""

    def __init__(self, pieces: Sequence[Tuple[str, float, int]]):
        self.pieces = list(pieces)
        self.piece_to_id: Dict[str, int] = {}
        self.scores: Dict[str, float] = {}
        self._unk_id = 0
        for i, (p, s, t) in enumerate(self.pieces):
            self.piece_to_id[p] = i
            if t in (_NORMAL, _USER_DEFINED):
                self.scores[p] = s
            if t == _UNKNOWN:
                self._unk_id = i

    @classmethod
    def load(cls, path: str) -> "SentencePieceBPE":
        with open(path, "rb") as f:
            return cls(parse_sentencepiece_model(f.read()))

    @property
    def vocab_size(self) -> int:
        return len(self.pieces)

    def unk_id(self) -> int:
        return self._unk_id

    def id_to_piece(self, i: Union[int, List[int]]):
        if isinstance(i, list):
            return [self.pieces[j][0] for j in i]
        return self.pieces[i][0]

    def piece_to_id_fn(self, p: Union[str, List[str]]):
        if isinstance(p, list):
            return [self.piece_to_id.get(x, self._unk_id) for x in p]
        return self.piece_to_id.get(p, self._unk_id)

    def _encode_word(self, word: str) -> List[str]:
        """BPE merge loop: repeatedly merge the adjacent pair whose
        concatenation has the highest score in the vocab."""
        symbols = list(word)
        if not symbols:
            return []
        while True:
            best_score = None
            best_i = -1
            for i in range(len(symbols) - 1):
                merged = symbols[i] + symbols[i + 1]
                s = self.scores.get(merged)
                if s is not None and (best_score is None or s > best_score):
                    best_score = s
                    best_i = i
            if best_i < 0:
                break
            symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        return symbols

    def encode_to_pieces(self, text: str) -> List[str]:
        """SP-style: add dummy prefix, spaces -> ▁, BPE per chunk."""
        if not text:
            return []
        text = WORD_SEP + text.replace(" ", WORD_SEP)
        out = self._encode_word(text)
        # split unknown multi-char symbols into single chars (SP marks each
        # unknown char individually)
        final: List[str] = []
        for sym in out:
            if sym in self.piece_to_id or len(sym) == 1:
                final.append(sym)
            else:
                final.extend(sym)
        return final

    def encode(self, text: str) -> List[int]:
        return [self.piece_to_id.get(p, self._unk_id) for p in self.encode_to_pieces(text)]

    def decode_pieces(self, pieces: List[str]) -> str:
        return "".join(pieces).replace(WORD_SEP, " ").lstrip(" ")

    def decode(self, ids: List[int]) -> str:
        return self.decode_pieces([self.pieces[i][0] for i in ids])


PUNCTUATION_MARKS_TOKENS = [".", "!", "?", "▁.", "▁?", "▁..."]


def split_segments_by_token(
    tokenized_str: List[str],
    split_tokens: List[str],
    max_text_tokens_per_segment: int,
    quick_streaming_tokens: int = 0,
) -> List[List[str]]:
    """front.py:344-422, decision-for-decision."""
    if len(tokenized_str) == 0:
        return []
    segments: List[List[str]] = []
    current_segment: List[str] = []
    current_len = 0
    for i in range(len(tokenized_str)):
        token = tokenized_str[i]
        current_segment.append(token)
        current_len += 1
        if not ("," in split_tokens or "▁," in split_tokens) and (
            "," in current_segment or "▁," in current_segment
        ):
            sub_segments = split_segments_by_token(
                current_segment, [",", "▁,"], max_text_tokens_per_segment,
                quick_streaming_tokens,
            )
        elif "-" not in split_tokens and "-" in current_segment:
            sub_segments = split_segments_by_token(
                current_segment, ["-"], max_text_tokens_per_segment,
                quick_streaming_tokens,
            )
        elif current_len <= max_text_tokens_per_segment:
            if token in split_tokens and current_len > 2:
                if i < len(tokenized_str) - 1 and tokenized_str[i + 1] in ("'", "▁'"):
                    current_segment.append(tokenized_str[i + 1])
                segments.append(current_segment)
                current_segment = []
                current_len = 0
            continue
        else:
            sub_segments = []
            for j in range(0, len(current_segment), max_text_tokens_per_segment):
                sub_segments.append(
                    current_segment[j : j + max_text_tokens_per_segment]
                )
        segments.extend(sub_segments)
        current_segment = []
        current_len = 0
    if current_len > 0:
        segments.append(current_segment)
    # merge loop (front.py:406-422)
    merged: List[List[str]] = []
    total = 0
    for segment in segments:
        total += len(segment)
        if len(segment) == 0:
            continue
        if not merged:
            merged.append(segment)
        elif (
            len(merged[-1]) + len(segment) <= max_text_tokens_per_segment
            and total > quick_streaming_tokens
        ):
            merged[-1] = merged[-1] + segment
        elif len(merged[-1]) + len(segment) <= max_text_tokens_per_segment / 2:
            merged[-1] = merged[-1] + segment
        else:
            merged.append(segment)
    return merged


class TextTokenizer:
    """front.py TextTokenizer surface over our SP-BPE + normalizer."""

    def __init__(self, model_path_or_bpe, normalizer: Optional[TextNormalizer] = None):
        if isinstance(model_path_or_bpe, SentencePieceBPE):
            self.sp = model_path_or_bpe
        else:
            self.sp = SentencePieceBPE.load(model_path_or_bpe)
        self.normalizer = normalizer

    @property
    def vocab_size(self):
        return self.sp.vocab_size

    @property
    def unk_token_id(self):
        return self.sp.unk_id()

    def convert_tokens_to_ids(self, tokens: Union[List[str], str]) -> List[int]:
        if isinstance(tokens, str):
            tokens = [tokens]
        return [self.sp.piece_to_id_fn(t) for t in tokens]

    def convert_ids_to_tokens(self, ids):
        return self.sp.id_to_piece(ids)

    def tokenize(self, text: str) -> List[str]:
        if len(text) == 0:
            return []
        if len(text.strip()) == 1:
            return self.sp.encode_to_pieces(text)
        if self.normalizer:
            text = self.normalizer.normalize(text)
        text = tokenize_by_cjk_char(text)
        return self.sp.encode_to_pieces(text)

    def encode(self, text: str) -> List[int]:
        return self.convert_tokens_to_ids(self.tokenize(text))

    def decode(self, ids: List[int], do_lower_case: bool = False) -> str:
        return de_tokenize_by_cjk_char(self.sp.decode(list(ids)), do_lower_case)

    def split_segments(
        self,
        tokenized: List[str],
        max_text_tokens_per_segment: int = 120,
        quick_streaming_tokens: int = 0,
    ) -> List[List[str]]:
        return split_segments_by_token(
            tokenized,
            PUNCTUATION_MARKS_TOKENS,
            max_text_tokens_per_segment,
            quick_streaming_tokens,
        )


def byte_fallback_ids(text: str, number_text_tokens: int, max_bytes: int = 400):
    """Tokenizer-less pseudo-ids (random-weights smoke paths): UTF-8 bytes
    mapped into the text vocab's content range [2, vocab). One shared
    definition so the server, benchmarks and the eval harness segment the
    same text identically."""
    import numpy as np

    ids = np.frombuffer(text.encode()[:max_bytes], dtype=np.uint8).astype(np.int32)
    return ids % max(2, number_text_tokens - 2) + 2
