"""Native C++ text frontend vs the Python twins (skipped if not built)."""

import subprocess

import pytest

from wetts_tpu.text import native
from wetts_tpu.text.sandhi import apply_sandhi
from wetts_tpu.text.segmenter import WordBreak, sentence_segment
from wetts_tpu.text.g2p_en import G2pEn

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built")


CASES = [
    ("我爱编程，但是今天下雨了。明天呢？好吧！", 0),
    ("Hello, world! Are you OK? Yes; good.", 0),
    ("abc def ghi jkl", 4),
    ("我爱编程学习", 3),
    ("11月10日，第十五届全国运动会。来自广州的\"00后\"志愿者", 32),
    ("", 0),
]


def test_sentence_segment_parity():
    for text, maxlen in CASES:
        assert native.sentence_segment(text, maxlen) == \
            sentence_segment(text, maxlen)


def test_sandhi_parity():
    cases = [
        ("你好", ["ni3", "hao3"]),
        ("不要", ["bu4", "yao4"]),
        ("第一名", ["di4", "yi1", "ming2"]),
        ("一起", ["yi1", "qi3"]),
    ]
    for word, pinyin in cases:
        assert native.sandhi(word, pinyin) == apply_sandhi(word, pinyin)


def test_wordbreak_parity(tmp_path):
    lex = tmp_path / "lexicon.txt"
    words = ["我", "爱", "我爱", "编程", "中国", "中国人", "人民"]
    lex.write_text("\n".join(f"{w} x" for w in words), encoding="utf8")
    nat = native.NativeWordBreak(str(lex))
    py = WordBreak(set(words))
    for text in ["我爱编程", "中国人民", "hello 世界", "我爱python编程", ""]:
        assert nat.segment(text) == py.segment(text)


def test_g2p_en_parity(tmp_path):
    cmu = tmp_path / "cmu.txt"
    cmu.write_text("hello HH AH0 L OW1\nworld W ER1 L D\na EY1\nb B IY1\n"
                   "c S IY1\nsuper S UW1 P ER0\nman M AE1 N\n"
                   "tensor T EH1 N S ER0\nflow F L OW1\n",
                   encoding="utf8")
    nat = native.NativeG2pEn(str(cmu))
    py = G2pEn(str(cmu))
    for word in ["hello", "abc", "super-man", "superman", "ab",
                 "tensorflow", "blargish", "knightly", "tensor-blarg"]:
        assert nat.convert(word) == py.convert(word), word
    # long-OOV quality: compound split beats letter spelling
    assert py.convert("tensorflow") == [
        "T", "EH1", "N", "S", "ER0", "F", "L", "OW1"]
    # residue goes through letter-to-sound, not letter spelling
    assert "#0" not in py.convert("blargish")
