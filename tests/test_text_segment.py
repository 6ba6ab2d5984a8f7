"""Text segmentation + sandhi tests.

Ports the reference's gtest suites (runtime/core/test/sandhi_test.cc,
sentence_break_test.cc, word_break_test.cc) case-for-case, plus extras.
"""

from wetts_tpu.text import WordBreak, apply_sandhi, sentence_segment


# ---- sandhi (sandhi_test.cc:24-101) ---------------------------------------

def test_sandhi_two_consecutive_third_tone():
    assert apply_sandhi("你好", ["ni3", "hao3"]) == ["ni2", "hao3"]


def test_sandhi_bu_fourth_tone():
    assert apply_sandhi("不要", ["bu4", "yao4"]) == ["bu2", "yao4"]


def test_sandhi_bu_non_fourth_tone():
    assert apply_sandhi("不好", ["bu4", "hao3"]) == ["bu4", "hao3"]


def test_sandhi_yi_fourth_tone():
    assert apply_sandhi("一个", ["yi1", "ge4"]) == ["yi2", "ge4"]


def test_sandhi_yi_non_fourth_tone():
    assert apply_sandhi("一起", ["yi1", "qi3"]) == ["yi4", "qi3"]


def test_sandhi_di_yi():
    assert apply_sandhi("第一名", ["di4", "yi1", "ming2"]) == \
        ["di4", "yi1", "ming2"]


def test_sandhi_complex():
    assert apply_sandhi("不很好", ["bu4", "hen3", "hao3"]) == \
        ["bu4", "hen2", "hao3"]


def test_sandhi_no_change():
    assert apply_sandhi("很好", ["hen3", "hao1"]) == ["hen3", "hao1"]


def test_sandhi_single_char():
    assert apply_sandhi("好", ["hao3"]) == ["hao3"]


# ---- sentence break (sentence_break_test.cc:24-76) ------------------------

def test_sentence_chinese_punctuation():
    text = "我爱编程，但是今天下雨了。明天呢？好吧！"
    assert sentence_segment(text) == [
        "我爱编程，但是今天下雨了。", "明天呢？", "好吧！"]


def test_sentence_english_punctuation():
    text = "Hello, world! Are you OK? Yes; good."
    assert sentence_segment(text) == [
        "Hello, world!", "Are you OK?", "Yes;", "good."]


def test_sentence_max_length_words():
    assert sentence_segment("abc def ghi jkl", 4) == [
        "abc", "def", "ghi", "jkl"]


def test_sentence_chinese_max_length():
    assert sentence_segment("我爱编程学习", 3) == ["我爱编", "程学习"]


def test_sentence_comma_safe_break():
    text = ("11月10日，第十五届全国运动会武术套路比赛在广州南沙体育馆收官。"
            "来自广州的\"00后\"志愿者李镁雪也结束了她的\"最后一班岗\"")
    assert sentence_segment(text, 32) == [
        "11月10日，",
        "第十五届全国运动会武术套路比赛在广州南沙体育馆收官。",
        "来自广州的\"00后\"志愿者李镁雪也结束了她的\"最后一班岗\"",
    ]


def test_sentence_empty():
    assert sentence_segment("") == []
    assert sentence_segment("   ") == []


# ---- word break (word_break_test.cc semantics) ----------------------------

DICT = {"我", "爱", "我爱", "编程", "中国", "中国人", "人民"}


def test_word_break_longest_match():
    wb = WordBreak(DICT)
    assert wb.segment("我爱编程") == ["我爱", "编程"]
    assert wb.segment("中国人民") == ["中国人", "民"]


def test_word_break_ascii_runs():
    wb = WordBreak(DICT)
    assert wb.segment("hello world") == ["hello", " ", "world"]
    assert wb.segment("abc123 编程") == ["abc123", " ", "编程"]


def test_word_break_mixed():
    wb = WordBreak(DICT)
    assert wb.segment("我爱python编程") == ["我爱", "python", "编程"]


def test_word_break_oov_chars():
    wb = WordBreak(DICT)
    assert wb.segment("猫狗") == ["猫", "狗"]


def test_word_break_empty():
    assert WordBreak(DICT).segment("") == []
