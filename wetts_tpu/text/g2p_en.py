"""English grapheme-to-phoneme.

Behavioral parity target: runtime/core/frontend/g2p_en.cc:67-114 —
CMUdict lookup; short OOV (< 4 chars) spelled letter-by-letter joined with
`#0`; long OOV split on '-' and converted piecewise. The reference's
phonetisaurus-FST fallback for long OOV is replaced by a rule-based
letter-spelling fallback (the FST model file is an optional external asset
there too).
"""

from __future__ import annotations

from typing import Dict, List


class G2pEn:
    def __init__(self, cmudict_path: str):
        self.cmudict: Dict[str, List[str]] = {}
        with open(cmudict_path, encoding="utf8") as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) >= 2:
                    self.cmudict.setdefault(parts[0], parts[1:])

    def _spell(self, word: str) -> List[str]:
        phones: List[str] = []
        for i, ch in enumerate(word):
            phones.extend(self.cmudict.get(ch, []))
            if i < len(word) - 1:
                phones.append("#0")
        return phones

    def convert(self, grapheme: str) -> List[str]:
        if grapheme in self.cmudict:
            return list(self.cmudict[grapheme])
        if len(grapheme) < 4:
            return self._spell(grapheme)
        parts = [p for p in grapheme.split("-") if p]
        phones: List[str] = []
        for i, part in enumerate(parts):
            if part in self.cmudict:
                phones.extend(self.cmudict[part])
            else:
                phones.extend(self._spell(part))
            if i < len(parts) - 1:
                phones.append("#0")
        return phones

    def convert_str(self, grapheme: str) -> str:
        return " ".join(self.convert(grapheme))
