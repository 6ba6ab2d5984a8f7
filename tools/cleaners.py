#!/usr/bin/env python
"""English text cleaners for LJSpeech-style corpora.

Behavioral parity target: tools/cleaners.py:43-78 (Tacotron-derived) —
lowercase, abbreviation expansion, G2P, then prosody mapping: apostrophes
dropped, spaces/hyphens -> #1 (if not following another marker),
,!?. -> #3 (upgrading an existing weaker marker), final marker forced #4.
Uses this framework's CMUdict G2P (text/g2p_en.py) instead of the g2p_en
package; the wrapper tokenizes words+punctuation in reading order.
"""

from __future__ import annotations

import re
from typing import List

ABBREVIATIONS = {
    "mrs": "misess", "mr": "mister", "dr": "doctor", "st": "saint",
    "co": "company", "jr": "junior", "maj": "major", "gen": "general",
    "drs": "doctors", "rev": "reverend", "lt": "lieutenant",
    "hon": "honorable", "sgt": "sergeant", "capt": "captain",
    "esq": "esquire", "ltd": "limited", "col": "colonel", "ft": "fort",
}

_PROSODIES = ["#0", "#1", "#2", "#3", "#4"]


def expand_abbreviations(text: str) -> str:
    def sub(m):
        return ABBREVIATIONS[m.group(1).lower()]

    pattern = r"\b(" + "|".join(ABBREVIATIONS) + r")\."
    return re.sub(pattern, sub, text, flags=re.IGNORECASE)


def tokenize(text: str) -> List[str]:
    """Words and punctuation marks in reading order."""
    return re.findall(r"[a-z']+|[-,!?.]|\s+", text)


def phonemize(text: str, g2p) -> List[str]:
    """text -> phoneme/punctuation stream (like g2p_en's G2p output)."""
    out: List[str] = []
    for tok in tokenize(text):
        if re.match(r"^[a-z']+$", tok):
            word = tok.strip("'")
            if word:
                out.extend(g2p.convert(word))
        elif tok.strip() == "":
            out.append(" ")
        else:
            out.append(tok)
    return [p for p in out if p != "#0"]


def filter_prosody(phonemes: List[str], use_prosody: bool) -> List[str]:
    """Reference `filter` (cleaners.py:43-67)."""
    phones: List[str] = []
    if not use_prosody:
        return [p for p in phonemes if not re.match(r"^[-,!?.' ]+$", p)]
    for p in phonemes:
        if re.match(r"^[']+$", p):
            continue
        if re.match(r"^[- ]+$", p):
            if phones and "#" not in phones[-1]:
                phones.append(_PROSODIES[1])
        elif re.match(r"^[,!?.]+$", p):
            if phones and "#" in phones[-1]:
                phones[-1] = max(phones[-1], _PROSODIES[3])
            else:
                phones.append(_PROSODIES[3])
        else:
            phones.append(p)
    if not phones:
        return phones
    if "#" in phones[-1]:
        phones[-1] = _PROSODIES[-1]
    else:
        phones.append(_PROSODIES[-1])
    return phones


def english_cleaners(text: str, g2p, use_prosody: bool = True) -> List[str]:
    text = expand_abbreviations(text.lower())
    return filter_prosody(phonemize(text, g2p), use_prosody)
