"""Tokenizer tests: SP protobuf parsing, BPE merges, segment splitting."""

import struct

import numpy as np
import pytest

from indextts_tpu.frontend.normalize import TextNormalizer
from indextts_tpu.frontend.tokenizer import (
    PUNCTUATION_MARKS_TOKENS,
    SentencePieceBPE,
    TextTokenizer,
    parse_sentencepiece_model,
    split_segments_by_token,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _piece_msg(piece: str, score: float, ptype: int = 1) -> bytes:
    pb = piece.encode("utf-8")
    body = b"\x0a" + _varint(len(pb)) + pb  # field 1, wire 2
    body += b"\x15" + struct.pack("<f", score)  # field 2, wire 5
    body += b"\x18" + _varint(ptype)  # field 3, wire 0
    return b"\x0a" + _varint(len(body)) + body  # ModelProto field 1


PIECES = [
    ("<unk>", 0.0, 2),
    ("<s>", 0.0, 3),
    ("</s>", 0.0, 3),
    ("▁", -2.0, 1),
    ("h", -3.0, 1),
    ("e", -3.1, 1),
    ("l", -3.2, 1),
    ("o", -3.3, 1),
    ("he", -1.0, 1),
    ("ll", -1.2, 1),
    ("hell", -0.9, 1),
    ("hello", -0.5, 1),
    ("▁hello", -0.4, 1),
    ("▁.", -1.5, 1),
    (".", -4.0, 1),
    ("▁,", -1.6, 1),
    (",", -4.1, 1),
    ("-", -4.2, 1),
]


def test_protobuf_roundtrip():
    blob = b"".join(_piece_msg(*p) for p in PIECES)
    parsed = parse_sentencepiece_model(blob)
    assert [(p, round(s, 4), t) for p, s, t in parsed] == [
        (p, round(s, 4), t) for p, s, t in PIECES
    ]


def test_bpe_merges():
    sp = SentencePieceBPE(PIECES)
    assert sp.encode_to_pieces("hello") == ["▁hello"]
    # unknown chars stay as single symbols -> unk ids
    ids = sp.encode("hezzz")
    assert sp.unk_id() in ids


def test_bpe_greedy_score_order():
    sp = SentencePieceBPE(PIECES)
    # 'hell' (score -0.9) wins over 'he'+'ll'
    pieces = sp.encode_to_pieces("hell")
    # ▁ + hell: '▁hell' not in vocab so stays as ['▁', 'hell']
    assert pieces == ["▁", "hell"]


def test_split_segments_punctuation():
    toks = ["a", "b", "▁.", "c", "d", "e", "▁.", "f"]
    segs = split_segments_by_token(toks, PUNCTUATION_MARKS_TOKENS, 4)
    flat = [t for s in segs for t in s]
    assert flat == toks
    assert all(len(s) <= 4 for s in segs)


def test_split_segments_merges_small():
    toks = ["a", "▁.", "b", "▁.", "c", "▁."]
    segs = split_segments_by_token(toks, PUNCTUATION_MARKS_TOKENS, 120)
    # everything merges into one segment under the limit
    assert len(segs) == 1


def test_split_segments_long_run_hard_chunk():
    toks = ["x"] * 25
    segs = split_segments_by_token(toks, PUNCTUATION_MARKS_TOKENS, 10)
    # reference semantics: overflow chunks to [10,1], remainder merges
    assert [len(s) for s in segs] == [10, 1, 10, 4]
    assert [t for s in segs for t in s] == toks


def test_normalizer_basic_en():
    n = TextNormalizer()
    out = n.normalize("This sales for 2.5% off, only $12.5.")
    assert "%" not in out and "$" not in out
    assert "percent" in out and "dollars" in out


def test_normalizer_basic_zh():
    n = TextNormalizer()
    out = n.normalize("共465篇，约315万字")
    assert "465" not in out
    assert "四百六十五" in out


def test_normalizer_pinyin_preserved():
    n = TextNormalizer()
    out = n.normalize("晕XUAN4是一种GAN3觉")
    # reference converts jqx+u to v-form and uppercases (front.py:144-155)
    assert "XVAN4" in out
    assert "GAN3" in out


def test_normalizer_contraction():
    n = TextNormalizer()
    assert "where is" in n.normalize("where's the money?")


def test_tokenizer_end_to_end():
    sp = SentencePieceBPE(PIECES)
    tok = TextTokenizer(sp, TextNormalizer())
    # tokenize_by_cjk_char uppercases; use an uppercase probe vocab
    pieces = tok.tokenize("hello hello")
    assert pieces[0] == "▁"  # uppercased text falls back to char pieces

    ids = tok.convert_tokens_to_ids(pieces)
    assert all(isinstance(i, int) for i in ids)


def test_split_segments_quick_streaming_parity():
    """quick_streaming_tokens (small early segments for streaming TTFB,
    infer_v2.py:573,700): decision-for-decision parity with the reference
    splitter across token shapes and quick values."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from reference_compat import import_reference

    front = import_reference("indextts.utils.front")
    ref_split = front.TextTokenizer.split_segments_by_token

    cases = [
        ["a", "b", "▁.", "c", "d", "e", "▁.", "f", "g", "▁.", "h"] * 3,
        ["x"] * 25,
        ["a", "▁.", "b", "▁.", "c", "▁."] * 8,
        ["w"] * 3 + ["▁."] + ["y"] * 7 + ["▁."] + ["z"] * 40,
    ]
    for toks in cases:
        for quick in (0, 2, 5, 12):
            for cap in (4, 10, 120):
                want = ref_split(toks, PUNCTUATION_MARKS_TOKENS, cap,
                                 quick_streaming_tokens=quick)
                got = split_segments_by_token(toks, PUNCTUATION_MARKS_TOKENS,
                                              cap, quick_streaming_tokens=quick)
                assert got == want, (toks[:8], quick, cap)


def test_byte_fallback_ids_shared_helper():
    """byte_fallback_ids: deterministic, in-vocab, byte-capped — the one
    definition behind the server's, benchmarks' and eval harness's
    tokenizer-less paths."""
    from indextts_tpu.frontend.tokenizer import byte_fallback_ids

    ids = byte_fallback_ids("hello world", 50)
    assert ids.dtype.kind == "i" and len(ids) == 11
    assert (ids >= 2).all() and (ids < 50).all()
    # identical text -> identical ids; byte cap honored
    assert (byte_fallback_ids("hello world", 50) == ids).all()
    assert len(byte_fallback_ids("x" * 1000, 50, max_bytes=200)) == 200
