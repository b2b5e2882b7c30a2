"""Text normalization: zh/en number+symbol expansion, pinyin-tone and CJK-name
protection, char replacement maps.

Parity target: indextts/utils/front.py TextNormalizer (:11-228). The reference
delegates heavy TN to WeTextProcessing (zh) / tn (en), neither of which is a
framework component — here the same surface is implemented in pure Python:
char maps, pinyin save/restore, name placeholders and contraction expansion
replicate the reference exactly; number/date/currency expansion is our own
rule-based normalizer with equivalent coverage of the reference's test cases
(front.py:444-489).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

CHAR_REP_MAP = {
    "：": ",", "；": ",", ";": ",", "，": ",", "。": ".", "！": "!", "？": "?",
    "\n": " ", "·": "-", "、": ",", "...": "…", ",,,": "…", "，，，": "…",
    "……": "…", "“": "'", "”": "'", '"': "'", "‘": "'", "’": "'", "（": "'",
    "）": "'", "(": "'", ")": "'", "《": "'", "》": "'", "【": "'", "】": "'",
    "[": "'", "]": "'", "—": "-", "～": "-", "~": "-", "「": "'", "」": "'",
    ":": ",",
}
ZH_CHAR_REP_MAP = {"$": ".", **CHAR_REP_MAP}

PINYIN_TONE_PATTERN = (
    r"(?<![a-z])((?:[bpmfdtnlgkhjqxzcsryw]|[zcs]h)?"
    r"(?:[aeiouüv]|[ae]i|u[aio]|ao|ou|i[aue]|[uüv]e|[uvü]ang?|uai|"
    r"[aeiuv]n|[aeio]ng|ia[no]|i[ao]ng)|ng|er)([1-5])"
)
NAME_PATTERN = "[一-鿿]+(?:[-·—][一-鿿]+){1,2}"
ENGLISH_CONTRACTION_PATTERN = (
    r"(what|where|who|which|how|t?here|it|s?he|that|this)'s"
)

_DIGITS_ZH = "零一二三四五六七八九"
_UNITS_ZH = ["", "十", "百", "千"]
_GROUPS_ZH = ["", "万", "亿", "万亿"]

_ONES_EN = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS_EN = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]


def num_to_zh(n: int) -> str:
    """Integer -> Chinese reading (standard, with 两-free simple style)."""
    if n == 0:
        return "零"
    if n < 0:
        return "负" + num_to_zh(-n)
    groups = []
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    parts: List[str] = []
    for gi in reversed(range(len(groups))):
        g = groups[gi]
        if g == 0:
            continue
        s = ""
        digits = [(g // 1000) % 10, (g // 100) % 10, (g // 10) % 10, g % 10]
        started = False
        zero_pending = False
        for pos, d in enumerate(digits):
            unit = _UNITS_ZH[3 - pos]
            if d == 0:
                if started:
                    zero_pending = True
                continue
            if zero_pending:
                s += "零"
                zero_pending = False
            s += _DIGITS_ZH[d] + unit
            started = True
        # 一十x -> 十x at the very front of the whole number
        parts_s = s
        if gi == len(groups) - 1 and parts_s.startswith("一十"):
            parts_s = parts_s[1:]
        # needs leading 零 if a higher group skipped magnitudes
        if parts and groups[gi + 1] != 0 and g < 1000:
            parts_s = "零" + parts_s
        parts.append(parts_s + _GROUPS_ZH[gi])
    return "".join(parts)


def digits_to_zh(s: str) -> str:
    """Digit-by-digit reading (phone numbers, years)."""
    return "".join(_DIGITS_ZH[int(c)] if c.isdigit() else c for c in s)


def num_to_en(n: int) -> str:
    if n < 0:
        return "minus " + num_to_en(-n)
    if n < 20:
        return _ONES_EN[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS_EN[t] + ("-" + _ONES_EN[r] if r else "")
    if n < 1000:
        h, r = divmod(n, 100)
        return _ONES_EN[h] + " hundred" + (" " + num_to_en(r) if r else "")
    for scale, word in ((10 ** 9, "billion"), (10 ** 6, "million"), (10 ** 3, "thousand")):
        if n >= scale:
            q, r = divmod(n, scale)
            return num_to_en(q) + " " + word + (" " + num_to_en(r) if r else "")
    return str(n)


_ORDINAL_EN = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def ordinal_to_en(n: int) -> str:
    """123 -> 'one hundred twenty-third'."""
    words = num_to_en(n)
    head, sep, last = words.rpartition("-")
    if not sep:
        head, sep, last = words.rpartition(" ")
    if last in _ORDINAL_EN:
        last = _ORDINAL_EN[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    return head + sep + last


def _en_number_token(m: re.Match) -> str:
    s = m.group(0)
    if "." in s:
        ip, fp = s.split(".", 1)
        ip_w = num_to_en(int(ip)) if ip else "zero"
        fp_w = " ".join(_ONES_EN[int(c)] for c in fp)
        return f"{ip_w} point {fp_w}"
    v = int(s)
    # 4-digit years read as pairs when in a plausible year range
    if 1100 <= v <= 2999 and len(s) == 4 and s[2] != "0":
        return num_to_en(v // 100) + " " + num_to_en(v % 100)
    return num_to_en(v)


# (value-pattern, singular, plural) — longest symbols first so km/h wins over km
_UNITS_EN = [
    ("km/h", "kilometer per hour", "kilometers per hour"),
    ("mph", "mile per hour", "miles per hour"),
    ("kg", "kilogram", "kilograms"),
    ("km", "kilometer", "kilometers"),
    ("cm", "centimeter", "centimeters"),
    ("mm", "millimeter", "millimeters"),
    ("GHz", "gigahertz", "gigahertz"),
    ("MHz", "megahertz", "megahertz"),
    ("GB", "gigabyte", "gigabytes"),
    ("MB", "megabyte", "megabytes"),
    ("°C", "degree Celsius", "degrees Celsius"),
    ("℃", "degree Celsius", "degrees Celsius"),
]


def _en_phone(m: re.Match) -> str:
    parts = [p for p in re.split(r"[-. ]", m.group(0)) if p]
    return ", ".join(" ".join(_ONES_EN[int(c)] for c in p) for p in parts)


def normalize_en(text: str) -> str:
    t = text
    # letter-digit boundary: beta2 -> beta 2 (reference corpus: "beta two")
    t = re.sub(r"([a-zA-Z])(\d)", r"\1 \2", t)
    # unary minus: standalone "-3" -> "minus 3" (not ranges/hyphenated words)
    t = re.sub(r"(?<![A-Za-z\d.])-(?=\d)", "minus ", t)
    # phone numbers: digit-wise, grouped by separator
    t = re.sub(r"\b\d{3}[-. ]\d{3,4}[-. ]\d{4}\b", _en_phone, t)
    t = re.sub(r"\$\s?(\d+(?:\.\d+)?)", lambda m: _en_number_token(re.match(r"\d+(?:\.\d+)?", m.group(1))) + " dollars", t)
    t = re.sub(r"(\d+(?:\.\d+)?)\s?%", lambda m: _en_number_token(re.match(r"\d+(?:\.\d+)?", m.group(1))) + " percent", t)
    t = re.sub(
        r"(\d{1,2}):(\d{2})\s?(AM|PM|am|pm)?",
        lambda m: num_to_en(int(m.group(1)))
        + (
            " o'clock" if m.group(2) == "00" else " " + num_to_en(int(m.group(2)))
        )
        + (" " + " ".join(m.group(3).upper()) if m.group(3) else ""),
        t,
    )
    # measures: 10km/h -> ten kilometers per hour
    for sym, one, many in _UNITS_EN:
        t = re.sub(
            r"(\d+(?:\.\d+)?)\s?" + re.escape(sym) + r"(?![a-zA-Z])",
            lambda m, one=one, many=many: _en_number_token(
                re.match(r"\d+(?:\.\d+)?", m.group(1))
            ) + " " + (one if m.group(1) == "1" else many),
            t,
        )
    # ordinals: 3rd -> third
    t = re.sub(r"\b(\d+)(st|nd|rd|th)\b",
               lambda m: ordinal_to_en(int(m.group(1))), t)
    # fractions: 3/4 -> three fourths, 1/2 -> one half
    def _frac(m):
        nu, de = int(m.group(1)), int(m.group(2))
        if de == 2:
            unit = "half" if nu == 1 else "halves"
        elif de == 4:
            unit = "quarter" if nu == 1 else "quarters"
        else:
            unit = ordinal_to_en(de) + ("" if nu == 1 else "s")
        return num_to_en(nu) + " " + unit
    t = re.sub(r"\b(\d{1,3})/(\d{1,3})\b", _frac, t)
    # ranges: 3-5 -> three to five (digits on both sides only)
    t = re.sub(r"\b(\d{1,4})\s?[-–~]\s?(\d{1,4})\b(?![-.\d])",
               lambda m: num_to_en(int(m.group(1))) + " to " + num_to_en(int(m.group(2))), t)
    # digit-letter boundary for anything the rules above didn't claim: 5s -> 5 s
    t = re.sub(r"(\d)([a-zA-Z])", r"\1 \2", t)
    t = re.sub(r"\d+(?:\.\d+)?", _en_number_token, t)
    return t


def _zh_number_token(m: re.Match) -> str:
    s = m.group(0)
    if "." in s:
        ip, fp = s.split(".", 1)
        return num_to_zh(int(ip)) + "点" + digits_to_zh(fp)
    if len(s) >= 9:  # long digit strings read digit-wise
        return digits_to_zh(s)
    return num_to_zh(int(s))


_PHONE_DIGITS_ZH = "零幺二三四五六七八九"  # phones read 1 as 幺

_MEASURES_ZH = [
    ("km/h", "公里每小时"),
    ("kg", "千克"),
    ("km", "公里"),
    ("cm", "厘米"),
    ("mm", "毫米"),
    ("°C", "摄氏度"),
    ("℃", "摄氏度"),
]


def phone_to_zh(s: str) -> str:
    return "".join(_PHONE_DIGITS_ZH[int(c)] if c.isdigit() else "" for c in s)


def normalize_zh(text: str) -> str:
    t = text
    # unary minus: "-3" -> 负三 (hyphen directly before a digit, not a range)
    t = re.sub(r"(?<![A-Za-z\d.])-(?=\d)", "负", t)
    # phone numbers: digit-wise with 幺 for 1
    t = re.sub(r"\d{3,4}-\d{3,4}-\d{4}", lambda m: phone_to_zh(m.group(0)), t)
    t = re.sub(r"(?<!\d)1[3-9]\d{9}(?!\d)", lambda m: phone_to_zh(m.group(0)), t)
    # dates: 2030/1/2 -> 二零三零年一月二日
    t = re.sub(
        r"(\d{4})/(\d{1,2})/(\d{1,2})",
        lambda m: digits_to_zh(m.group(1)) + "年" + num_to_zh(int(m.group(2)))
        + "月" + num_to_zh(int(m.group(3))) + "日",
        t,
    )
    t = re.sub(r"(\d{4})年", lambda m: digits_to_zh(m.group(1)) + "年", t)
    t = re.sub(r"(\d{1,2})月(\d{1,2})日", lambda m: num_to_zh(int(m.group(1))) + "月" + num_to_zh(int(m.group(2))) + "日", t)
    t = re.sub(r"(\d{1,2}):(\d{2})", lambda m: num_to_zh(int(m.group(1))) + "点" + (num_to_zh(int(m.group(2))) + "分" if m.group(2) != "00" else ""), t)
    t = re.sub(r"(\d+(?:\.\d+)?)\s?%", lambda m: "百分之" + _zh_number_token(re.match(r"\d+(?:\.\d+)?", m.group(1))), t)
    t = re.sub(r"¥\s?(\d+(?:\.\d+)?)", lambda m: _zh_number_token(re.match(r"\d+(?:\.\d+)?", m.group(1))) + "元", t)
    # measures: 10km/h -> 十公里每小时
    for sym, word in _MEASURES_ZH:
        t = re.sub(
            r"(\d+(?:\.\d+)?)\s?" + re.escape(sym) + r"(?![a-zA-Z])",
            lambda m, word=word: _zh_number_token(
                re.match(r"\d+(?:\.\d+)?", m.group(1))
            ) + word,
            t,
        )
    # fractions: 3/4 -> 四分之三
    t = re.sub(
        r"(?<![\d./])(\d{1,3})/(\d{1,3})(?![\d./])",
        lambda m: num_to_zh(int(m.group(2))) + "分之" + num_to_zh(int(m.group(1))),
        t,
    )
    # ranges: 3~5 / 3-5 -> 三到五
    t = re.sub(
        r"(?<![\d.-])(\d{1,4})\s?[-~～]\s?(\d{1,4})(?![\d.-])",
        lambda m: num_to_zh(int(m.group(1))) + "到" + num_to_zh(int(m.group(2))),
        t,
    )
    # trailing plus: 3000+ -> 三千多
    t = re.sub(r"(\d+)\s?\+", lambda m: _zh_number_token(re.match(r"\d+", m.group(1))) + "多", t)
    t = re.sub(r"\d+(?:\.\d+)?", _zh_number_token, t)
    return t


class TextNormalizer:
    """Drop-in equivalent of the reference TextNormalizer (front.py:11-228)."""

    def __init__(self):
        self.char_rep_map = CHAR_REP_MAP
        self.zh_char_rep_map = ZH_CHAR_REP_MAP

    def load(self):  # parity with reference API; nothing to lazily load
        return self

    @staticmethod
    def match_email(s: str) -> bool:
        return re.match(r"^[a-zA-Z0-9]+@[a-zA-Z0-9]+\.[a-zA-Z]+$", s) is not None

    def use_chinese(self, s: str) -> bool:
        has_chinese = bool(re.search("[一-鿿]", s))
        has_alpha = bool(re.search(r"[a-zA-Z]", s))
        if has_chinese or not has_alpha or self.match_email(s):
            return True
        return bool(re.search(PINYIN_TONE_PATTERN, s, re.IGNORECASE))

    # -- placeholder save/restore (front.py:157-228) --------------------

    def save_names(self, text: str):
        names = re.findall(NAME_PATTERN, text, re.IGNORECASE)
        if not names:
            return text, None
        names = list(set(names))
        for i, name in enumerate(names):
            text = text.replace(name, f"<n_{chr(ord('a') + i)}>")
        return text, names

    def restore_names(self, text: str, names):
        if not names:
            return text
        for i, name in enumerate(names):
            text = text.replace(f"<n_{chr(ord('a') + i)}>", name)
        return text

    def save_pinyin_tones(self, text: str):
        matches = re.findall(PINYIN_TONE_PATTERN, text, re.IGNORECASE)
        if not matches:
            return text, None
        pinyins = list(set("".join(p) for p in matches))
        for i, py in enumerate(pinyins):
            text = text.replace(py, f"<pinyin_{chr(ord('a') + i)}>")
        return text, pinyins

    @staticmethod
    def correct_pinyin(py: str) -> str:
        """jqx + u/ü -> v (front.py:144-155)."""
        if py[0] not in "jqxJQX":
            return py
        py = re.sub(r"([jqx])[uü](n|e|an)*(\d)", r"\g<1>v\g<2>\g<3>", py, flags=re.IGNORECASE)
        return py.upper()

    def restore_pinyin_tones(self, text: str, pinyins):
        if not pinyins:
            return text
        for i, py in enumerate(pinyins):
            text = text.replace(f"<pinyin_{chr(ord('a') + i)}>", self.correct_pinyin(py))
        return text

    # -- main entry -----------------------------------------------------

    def normalize(self, text: str) -> str:
        if self.use_chinese(text):
            text = re.sub(ENGLISH_CONTRACTION_PATTERN, r"\1 is", text, flags=re.IGNORECASE)
            replaced, pinyins = self.save_pinyin_tones(text.rstrip())
            replaced, names = self.save_names(replaced)
            result = normalize_zh(replaced)
            result = self.restore_names(result, names)
            result = self.restore_pinyin_tones(result, pinyins)
            pattern = re.compile("|".join(re.escape(p) for p in self.zh_char_rep_map))
            result = pattern.sub(lambda x: self.zh_char_rep_map[x.group()], result)
        else:
            text = re.sub(ENGLISH_CONTRACTION_PATTERN, r"\1 is", text, flags=re.IGNORECASE)
            result = normalize_en(text)
            pattern = re.compile("|".join(re.escape(p) for p in self.char_rep_map))
            result = pattern.sub(lambda x: self.char_rep_map[x.group()], result)
        return result


def tokenize_by_cjk_char(line: str, do_upper_case: bool = True) -> str:
    """utils/common.py:29-51."""
    pattern = (
        r"([ᄀ-ᇿ⺀-꓏ꡀ-힯豈-﫿"
        r"︰-﹏･-ￜ\U00020000-\U0002FFFF])"
    )
    chars = re.split(pattern, line.strip())
    return " ".join(
        w.strip().upper() if do_upper_case else w.strip() for w in chars if w.strip()
    )


def de_tokenize_by_cjk_char(line: str, do_lower_case: bool = False) -> str:
    """utils/common.py:54-81."""
    english_word_pattern = re.compile(r"([A-Z]+(?:[\s-][A-Z-]+)*)", re.IGNORECASE)
    english_sents = english_word_pattern.findall(line)
    for i, sent in enumerate(english_sents):
        line = line.replace(sent, f"<sent_{i}>")
    words = line.split()
    placeholder = re.compile(r"^.*?(<sent_(\d+)>)")
    for i in range(len(words)):
        m = placeholder.match(words[i])
        if m:
            words[i] = words[i].replace(m.group(1), english_sents[int(m.group(2))])
            if do_lower_case:
                words[i] = words[i].lower()
    return "".join(words)
