"""Property/fuzz diff of the text front-end against the reference
(VERDICT r4 stretch #10): every pure-Python surface of
/root/reference/indextts/utils/front.py that runs in this sandbox is fuzzed
against our implementation on seeded random inputs — language routing,
email detection, pinyin tone save/correct/restore, CJK name placeholders,
and the recursive segment splitter at random token streams / caps /
quick-streaming settings.

The WeTextProcessing/wetext normalization backends themselves are not
installed here (zero egress), so the zh/en TN *rewrite* stage cannot be
diffed directly — its coverage stays the reference's own corpus
(tests/test_tn_corpus.py); this fuzz bounds everything around it."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import import_reference  # noqa: E402

from indextts_tpu.frontend.normalize import TextNormalizer  # noqa: E402
from indextts_tpu.frontend.tokenizer import (  # noqa: E402
    PUNCTUATION_MARKS_TOKENS,
    split_segments_by_token,
)


@pytest.fixture(scope="module")
def ref_front():
    return import_reference("indextts.utils.front")


@pytest.fixture(scope="module")
def ref_tn(ref_front):
    return ref_front.TextNormalizer()  # .load() never called: no tn needed


OURS = TextNormalizer()

CJK = "一丁考种声我你他的了在是有美好世界中文语音合成测试张王李赵"
LATIN = "abcdefghijklmnopqrstuvwxyzABCDE"
MISC = " .,!?-:;@()[]0123456789%$#…—，。！？、"


def _rand_text(rng, n, alphabet):
    return "".join(alphabet[i] for i in rng.integers(0, len(alphabet), n))


def test_punctuation_token_list_matches(ref_front):
    assert PUNCTUATION_MARKS_TOKENS == ref_front.TextTokenizer.punctuation_marks_tokens


def test_fuzz_use_chinese(ref_tn):
    rng = np.random.default_rng(100)
    for _ in range(400):
        s = _rand_text(rng, int(rng.integers(0, 24)), CJK + LATIN + MISC)
        assert OURS.use_chinese(s) == ref_tn.use_chinese(s), repr(s)


def test_fuzz_match_email(ref_tn):
    rng = np.random.default_rng(101)
    parts = ["user", "a.b", "x_y", "", "mail", "99", "测试"]
    doms = ["example.com", "x.cn", "a.b.co", "nodot", "", "q-q.com"]
    for _ in range(300):
        s = (
            parts[rng.integers(0, len(parts))]
            + ("@" if rng.random() < 0.8 else "")
            + doms[rng.integers(0, len(doms))]
        )
        assert bool(OURS.match_email(s)) == bool(ref_tn.match_email(s)), repr(s)


def test_fuzz_correct_pinyin(ref_tn):
    rng = np.random.default_rng(102)
    initials = ["zh", "ch", "sh", "b", "p", "m", "j", "q", "x", "z", "c", "s", "l", ""]
    finals = ["ang", "ong", "uan", "iao", "a", "o", "e", "i", "u", "v"]
    for _ in range(400):
        py = (
            initials[rng.integers(0, len(initials))]
            + finals[rng.integers(0, len(finals))]
            + str(rng.integers(1, 6))
        )
        if rng.random() < 0.3:
            py = py.upper()
        assert OURS.correct_pinyin(py) == ref_tn.correct_pinyin(py), repr(py)


def test_fuzz_pinyin_tone_save_restore_roundtrip(ref_tn):
    """save -> (identity normalize) -> restore must behave identically:
    same saved text, same extracted pinyin list, same restored output."""
    rng = np.random.default_rng(103)
    pinyins = ["zhong4", "DE5", "hao3", "xiang1", "ni3", "shi4"]
    for _ in range(300):
        segs = []
        for _ in range(int(rng.integers(1, 6))):
            if rng.random() < 0.5:
                segs.append(_rand_text(rng, int(rng.integers(1, 6)), CJK))
            else:
                segs.append(pinyins[rng.integers(0, len(pinyins))])
        text = "".join(segs)
        ours_saved, ours_list = OURS.save_pinyin_tones(text)
        ref_saved, ref_list = ref_tn.save_pinyin_tones(text)
        assert ours_saved == ref_saved, repr(text)
        assert (ours_list or []) == (ref_list or []), repr(text)
        if ref_list:
            assert OURS.restore_pinyin_tones(
                ours_saved, ours_list
            ) == ref_tn.restore_pinyin_tones(ref_saved, ref_list), repr(text)


def test_fuzz_name_save_restore_roundtrip(ref_tn):
    rng = np.random.default_rng(104)
    surnames = ["赵", "钱", "孙", "李", "王"]
    for _ in range(300):
        segs = []
        for _ in range(int(rng.integers(1, 5))):
            r = rng.random()
            if r < 0.4:  # name-like CJK-CJK pattern
                segs.append(
                    surnames[rng.integers(0, len(surnames))]
                    + "-"
                    + _rand_text(rng, int(rng.integers(1, 3)), CJK)
                )
            elif r < 0.7:
                segs.append(_rand_text(rng, int(rng.integers(1, 6)), CJK))
            else:
                segs.append(_rand_text(rng, int(rng.integers(1, 6)), LATIN + " -"))
        text = "".join(segs)
        ours_saved, ours_names = OURS.save_names(text)
        ref_saved, ref_names = ref_tn.save_names(text)
        assert ours_saved == ref_saved, repr(text)
        assert (ours_names or []) == (ref_names or []), repr(text)
        if ref_names:
            assert OURS.restore_names(
                ours_saved, ours_names
            ) == ref_tn.restore_names(ref_saved, ref_names), repr(text)


def test_fuzz_segment_splitter(ref_front):
    """Random token streams (words, CJK chars, the splitter's punctuation
    tokens, commas/hyphens for the recursive fallbacks) x random caps x
    quick-streaming settings — segment lists must match the reference
    token-for-token."""
    import warnings

    rng = np.random.default_rng(105)
    vocab = (
        ["▁hello", "▁world", "lo", "ng", "▁a"]
        + list("我你他的了")
        + PUNCTUATION_MARKS_TOKENS
        + ["▁,", ",", "-", "▁..."]
    )
    for trial in range(300):
        toks = [vocab[i] for i in rng.integers(0, len(vocab), rng.integers(0, 40))]
        cap = int(rng.integers(2, 24))
        quick = int(rng.integers(0, 3)) * int(rng.integers(0, 6))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # oversize-segment warning path
            want = ref_front.TextTokenizer.split_segments_by_token(
                list(toks), PUNCTUATION_MARKS_TOKENS, cap,
                quick_streaming_tokens=quick,
            )
            got = split_segments_by_token(
                list(toks), PUNCTUATION_MARKS_TOKENS, cap,
                quick_streaming_tokens=quick,
            )
        assert got == want, (trial, cap, quick, toks)
