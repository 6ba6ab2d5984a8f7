"""Rule-based CN/EN text-processing frontend.

Python implementation of the reference's C++ text pipeline
(runtime/core/frontend/*); a native C++ twin lives under native/ for the
serving runtime. Components: sentence/word segmentation, tone sandhi,
English G2P, pinyin lexicon generation, text normalization, and the
G2P+prosody orchestrator driven by the BERT frontend model.
"""

from wetts_tpu.text.segmenter import (
    WordBreak,
    sentence_segment,
    split_utf8_chars,
    is_english_word,
)
from wetts_tpu.text.sandhi import apply_sandhi
from wetts_tpu.text.lexicon import Lexicon, read_pinyin2phones
from wetts_tpu.text.g2p_en import G2pEn
from wetts_tpu.text.pinyin import generate_pinyin_lexicon
from wetts_tpu.text.tn import TextNormalizer

__all__ = [
    "WordBreak", "sentence_segment", "split_utf8_chars", "is_english_word",
    "apply_sandhi", "Lexicon", "read_pinyin2phones", "G2pEn",
    "generate_pinyin_lexicon", "TextNormalizer",
]
