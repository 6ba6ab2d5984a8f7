"""TN + G2pProsody orchestrator tests (fake scorer, synthetic lexicon)."""

import numpy as np
import pytest

from wetts_tpu.text.frontend import CLS, SEP, UNK, G2pProsody
from wetts_tpu.text.g2p_en import G2pEn
from wetts_tpu.text.lexicon import Lexicon
from wetts_tpu.text.tn import TextNormalizer, number_to_chinese


# ---- TN -------------------------------------------------------------------

def test_number_to_chinese():
    assert number_to_chinese(0) == "零"
    assert number_to_chinese(10) == "十"
    assert number_to_chinese(14) == "十四"
    assert number_to_chinese(105) == "一百零五"
    assert number_to_chinese(1234) == "一千二百三十四"
    assert number_to_chinese(10001) == "一万零一"
    assert number_to_chinese(200000000) == "二亿"


def test_tn_patterns():
    tn = TextNormalizer()
    assert tn.normalize("涨了5%") == "涨了百分之五"
    assert tn.normalize("3.14是圆周率") == "三点一四是圆周率"
    assert tn.normalize("2023年") == "二零二三年"
    assert tn.normalize("8月15日") == "八月十五日"
    assert tn.normalize("我有25个苹果") == "我有二十五个苹果"
    assert tn.normalize("电话13812345678") == "电话幺三八幺二三四五六七八"
    assert tn.normalize("气温-5度") == "气温负五度"
    assert tn.normalize("纯文本不变") == "纯文本不变"


# ---- G2pProsody -----------------------------------------------------------

@pytest.fixture
def pipeline(tmp_path):
    lex = tmp_path / "lexicon.txt"
    # 好 is the polyphone (hao3 / hao4)
    lex.write_text(
        "你好 ni3 hao3\n你 ni3\n好 hao3,hao4\n世界 shi4 jie4\n<UNK> unk\n",
        encoding="utf8")
    cmu = tmp_path / "cmudict.txt"
    cmu.write_text("hello HH AH0 L OW1\nworld W ER1 L D\na EY1\nb B IY1\n"
                   "c S IY1\n", encoding="utf8")
    vocab = {CLS: 0, SEP: 1, UNK: 2, "你": 3, "好": 4, "世": 5, "界": 6}
    pinyin2id = {"hao3": 0, "hao4": 1}
    pinyin2phones = {
        "ni3": ["n", "i3"], "hao3": ["h", "ao3"], "hao4": ["h", "ao4"],
        "ni2": ["n", "i2"],
        "shi4": ["sh", "iii4"], "jie4": ["j", "ie4"],
    }

    def scorer(ids):
        t = len(ids)
        poly = np.zeros((t, 2), np.float32)
        poly[:, 0] = 0.9  # always prefer hao3
        pros = np.zeros((t, 5), np.float32)
        pros[:, 1] = 1.0  # always rank #1
        return poly, pros

    lexicon = Lexicon(str(lex))
    return G2pProsody(scorer, vocab, lexicon, pinyin2id, pinyin2phones,
                      G2pEn(str(cmu)))


def test_tokenize(pipeline):
    words = ["你好", "世界", "hello"]
    ids, offsets = pipeline.tokenize(words)
    assert ids[0] == 0 and ids[-1] == 1       # CLS ... SEP
    assert ids[1:5] == [3, 4, 5, 6]
    assert ids[5] == 2                        # english -> UNK
    assert offsets == [1, 3, 5]


def test_compute_chinese(pipeline):
    phones = pipeline.compute("你好世界")
    # 你好: ni3 hao3 with sandhi 3+3 -> ni2 hao3; inside-word #0;
    # final token forced #4
    assert phones == ["n", "i2", "#0", "h", "ao3", "#1",
                      "sh", "iii4", "#0", "j", "ie4", "#4"]


def test_compute_english(pipeline):
    phones = pipeline.compute("hello")
    assert phones == ["HH", "AH0", "L", "OW1", "#4"]


def test_compute_mixed_punctuation(pipeline):
    phones = pipeline.compute("你好，世界")
    # comma rewrites the previous prosody token to #3
    assert phones == ["n", "i2", "#0", "h", "ao3", "#3",
                      "sh", "iii4", "#0", "j", "ie4", "#4"]


def test_english_short_oov_spelled(pipeline):
    phones = pipeline.compute("ABC")
    assert phones == ["EY1", "#0", "B", "IY1", "#0", "S", "IY1", "#4"]
