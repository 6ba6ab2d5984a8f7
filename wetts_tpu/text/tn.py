"""Text normalization (Chinese).

Behavioral parity target: the reference wraps WeTextProcessing's FST
tagger/verbalizer and degrades to identity when built without it
(runtime/core/frontend/tn.h:26-46). Here: a rule-based normalizer covering
the high-frequency patterns (cardinal numbers, decimals, percentages,
negative numbers, digit-string readings for phone-like sequences, years,
simple dates/times), falling back to identity elsewhere. The API matches
the reference's TN class (`normalize(text) -> text`).
"""

from __future__ import annotations

import re

_DIGITS = "零一二三四五六七八九"
_UNITS = ["", "十", "百", "千"]
_GROUP_UNITS = ["", "万", "亿", "万亿"]


def _read_group(n: int) -> str:
    """Read 0 <= n < 10000 in Mandarin (no group unit)."""
    if n == 0:
        return ""
    out = []
    need_zero = False
    for i in range(3, -1, -1):
        d = (n // 10**i) % 10
        if d == 0:
            if out:
                need_zero = True
            continue
        if need_zero:
            out.append(_DIGITS[0])
            need_zero = False
        out.append(_DIGITS[d] + _UNITS[i])
    return "".join(out)


def number_to_chinese(n: int) -> str:
    """Cardinal reading of a non-negative integer."""
    if n == 0:
        return _DIGITS[0]
    groups = []
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    out = []
    for i in range(len(groups) - 1, -1, -1):
        g = groups[i]
        if g == 0:
            continue
        piece = _read_group(g)
        # inter-group zero: 一亿零一 style
        if i < len(groups) - 1 and groups[i + 1] != 0 and g < 1000:
            piece = _DIGITS[0] + piece
        out.append(piece + _GROUP_UNITS[i])
    text = "".join(out)
    # 一十X -> 十X (10..19)
    if text.startswith("一十"):
        text = text[1:]
    return text


def digits_to_chinese(s: str) -> str:
    """Digit-by-digit reading (phone numbers, IDs); 1 -> 幺."""
    mapping = {"0": "零", "1": "幺", "2": "二", "3": "三", "4": "四",
               "5": "五", "6": "六", "7": "七", "8": "八", "9": "九"}
    return "".join(mapping.get(c, c) for c in s)


def decimal_to_chinese(int_part: str, frac_part: str) -> str:
    frac = "".join(_DIGITS[int(c)] for c in frac_part)
    return number_to_chinese(int(int_part)) + "点" + frac


class TextNormalizer:
    """Rule-based CN text normalization with identity fallback."""

    _RE_PERCENT = re.compile(r"(\d+)(?:\.(\d+))?%")
    _RE_DECIMAL = re.compile(r"(\d+)\.(\d+)")
    _RE_YEAR = re.compile(r"(\d{4})年")
    _RE_DATE = re.compile(r"(\d{1,2})月(\d{1,3})日")
    _RE_TIME = re.compile(r"(\d{1,2}):(\d{2})(?::(\d{2}))?")
    _RE_PHONE = re.compile(r"\d{7,}")
    _RE_NEG = re.compile(r"-(\d+)")
    _RE_INT = re.compile(r"\d+")

    def normalize(self, text: str) -> str:
        text = self._RE_PERCENT.sub(self._percent, text)
        text = self._RE_YEAR.sub(self._year, text)
        text = self._RE_DATE.sub(self._date, text)
        text = self._RE_TIME.sub(self._time, text)
        text = self._RE_DECIMAL.sub(
            lambda m: decimal_to_chinese(m.group(1), m.group(2)), text)
        text = self._RE_PHONE.sub(lambda m: digits_to_chinese(m.group(0)),
                                  text)
        text = self._RE_NEG.sub(
            lambda m: "负" + number_to_chinese(int(m.group(1))), text)
        text = self._RE_INT.sub(
            lambda m: number_to_chinese(int(m.group(0))), text)
        return text

    @staticmethod
    def _percent(m):
        if m.group(2):
            return "百分之" + decimal_to_chinese(m.group(1), m.group(2))
        return "百分之" + number_to_chinese(int(m.group(1)))

    @staticmethod
    def _year(m):
        return "".join(_DIGITS[int(c)] for c in m.group(1)) + "年"

    @staticmethod
    def _date(m):
        return (number_to_chinese(int(m.group(1))) + "月"
                + number_to_chinese(int(m.group(2))) + "日")

    @staticmethod
    def _time(m):
        out = number_to_chinese(int(m.group(1))) + "点"
        minute = int(m.group(2))
        if minute:
            out += number_to_chinese(minute) + "分"
        if m.group(3) and int(m.group(3)):
            out += number_to_chinese(int(m.group(3))) + "秒"
        return out
