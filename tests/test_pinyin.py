"""Pinyin lexicon generator vs the reference tool (imported as oracle)."""

import importlib.util
import sys

import pytest

from wetts_tpu.text.pinyin import generate_pinyin_lexicon, generate_symbols


def load_reference_tool():
    spec = importlib.util.spec_from_file_location(
        "ref_gen_pinyin", "/root/reference/tools/gen_pinyin_lexicon.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("zero,tone,erhua", [
    (False, False, False),
    (True, True, True),
    (False, True, True),   # the Baker recipe configuration (run.sh:27-30)
    (True, True, False),
])
def test_matches_reference_tool(zero, tone, erhua):
    ref = load_reference_tool()
    want = ref.generate_lexicon(zero, tone, erhua)
    got = generate_pinyin_lexicon(zero, tone, erhua)
    assert dict(got) == dict(want)
    assert list(got.keys()) == list(want.keys())  # same emission order
    assert generate_symbols(got) == ref.generate_symbols(want)


def test_well_known_syllables():
    lex = generate_pinyin_lexicon(with_tone=True, with_erhua=True)
    assert lex["ma1"] == "m a1"
    assert lex["zhong1"] == "zh ong1"
    assert lex["yi1"] == " i1"         # zero-initial i-row
    assert lex["wu3"] == " u3"
    assert lex["ju2"] == "j v2"        # j + ü spelled as u
    assert lex["liu2"] == "l iou2"     # iu spelling
    assert lex["dui4"] == "d uei4"     # ui spelling
    assert lex["lun2"] == "l uen2"     # un spelling
    assert lex["er2"] == " er2"
    assert "fi1" not in lex            # illegal combination (f + i-row)
    assert "bong1" not in lex
