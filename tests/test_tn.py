"""Golden-corpus table test for Chinese text normalization.

The reference delegates TN to WeTextProcessing's FST tagger/verbalizer
(runtime/core/frontend/tn.h:26-46). WeTextProcessing itself is not
installable here (no egress), so the expected outputs below are
transcribed from its documented verbalizer conventions (README examples
and the standard Mandarin readings its rules encode): cardinals with
万/亿 grouping, 百分之 prefix for percent, denominator-分之-numerator
fractions, 到 for ranges, 两 before measure words but 二 in ordinals and
compound numerals, 幺 in telephone digit strings, digit-wise year
readings, and 零-padded single-digit minutes.
"""

import pytest

from wetts_tpu.text.tn import TextNormalizer

CASES = [
    # --- cardinals (WeTextProcessing README: 共465篇，约315万字) ---
    ("共465篇", "共四百六十五篇"),
    ("约315万字", "约三百一十五万字"),
    ("世界500强", "世界五百强"),
    ("他得了0分", "他得了零分"),
    ("10000次", "一万次"),
    ("100005个", "十万零五个"),
    ("1000000元", "一百万元"),
    ("203个", "二百零三个"),
    ("1234567890", "十二亿三千四百五十六万七千八百九十"),
    # --- decimals ---
    ("3.14是圆周率", "三点一四是圆周率"),
    ("0.5杯", "零点五杯"),
    ("体重65.5kg", "体重六十五点五千克"),
    ("2.5元", "二点五元"),
    # --- negatives ---
    ("气温-5度", "气温负五度"),
    ("跌了-12.5", "跌了负十二点五"),
    # --- percent (README: 总共有12.5%的人) ---
    ("总共有12.5%的人", "总共有百分之十二点五的人"),
    ("涨了5%", "涨了百分之五"),
    ("增长100%", "增长百分之一百"),
    ("下降-3%", "下降负百分之三"),
    ("GDP增长6.1%", "GDP增长百分之六点一"),
    # --- fractions: denominator 分之 numerator ---
    ("1/3的学生", "三分之一的学生"),
    ("占2/5", "占五分之二"),
    ("7/10的概率", "十分之七的概率"),
    # --- ranges ---
    ("5-10个", "五到十个"),
    ("3~5天", "三到五天"),
    ("1.5-2.5倍", "一点五到二点五倍"),
    ("5-10%", "百分之五到百分之十"),
    ("2023-2024年", "二零二三到二零二四年"),
    # --- money ---
    ("¥99", "九十九元"),
    ("￥5.5", "五点五元"),
    ("¥2", "两元"),
    ("$10", "十美元"),
    ("$2", "两美元"),
    ("依法处以200元罚款", "依法处以二百元罚款"),
    # --- measure units ---
    ("5kg大米", "五千克大米"),
    ("2kg", "两千克"),
    ("10km", "十千米"),
    ("3cm宽", "三厘米宽"),
    ("500ml水", "五百毫升水"),
    ("25°C", "二十五摄氏度"),
    ("120km/h", "一百二十千米每小时"),
    ("50mg", "五十毫克"),
    # --- 二/两 selection ---
    ("2个苹果", "两个苹果"),
    ("第2名", "第二名"),
    ("12个", "十二个"),
    ("住了2年", "住了两年"),
    ("2点半", "两点半"),
    ("2月开学", "二月开学"),
    ("2人2件", "两人两件"),
    # --- dates ---
    ("2023年", "二零二三年"),
    ("8月15日", "八月十五日"),
    ("10月1号", "十月一号"),
    ("1997年7月1日", "一九九七年七月一日"),
    ("2024-01-05", "二零二四年一月五日"),
    ("2024/1/5", "二零二四年一月五日"),
    # --- times ---
    ("8:30", "八点三十分"),
    ("18:05", "十八点零五分"),
    ("12:00整", "十二点整"),
    ("9:15:30", "九点十五分三十秒"),
    # --- telephone (幺 reading) ---
    ("电话13812345678", "电话幺三八幺二三四五六七八"),
    ("热线010-12345678", "热线零幺零幺二三四五六七八"),
    # --- leading zeros read digit-wise ---
    ("编号007", "编号零零七"),
    # --- identity fallback ---
    ("纯文本不变", "纯文本不变"),
    ("Hello world", "Hello world"),
]


@pytest.mark.parametrize("raw,expected", CASES, ids=[c[0] for c in CASES])
def test_tn_golden(raw, expected):
    assert TextNormalizer().normalize(raw) == expected


def test_wetext_corpus_coverage():
    """157-case category corpus transcribed from WeTextProcessing's
    documented behavior (the reference's FST normalizer,
    runtime/core/frontend/tn.h:26-46): cardinal / 二-两 selection /
    decimal / negative / percent / fraction / date / time / money /
    measure / telephone / range / year / plain-char / mixed sentences.
    Measured coverage is asserted at 100% so any regression names the
    failing category+case."""
    import os

    tn = TextNormalizer()
    corpus = os.path.join(os.path.dirname(__file__), "data", "tn_corpus.tsv")
    fails = []
    total = 0
    for line in open(corpus, encoding="utf8"):
        cat, src, want = line.rstrip("\n").split("\t")
        total += 1
        got = tn.normalize(src)
        if got != want:
            fails.append(f"[{cat}] {src!r}: got {got!r} want {want!r}")
    assert total >= 150
    rate = (total - len(fails)) / total
    assert not fails, (f"TN corpus coverage {rate:.3f} "
                       f"({len(fails)}/{total} failing):\n"
                       + "\n".join(fails[:20]))
