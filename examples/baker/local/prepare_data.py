#!/usr/bin/env python
"""Baker (DataBaker CN) manifest preparation.

Behavioral parity target: examples/baker/local/prepare_data.py:13-52 —
parse ProsodyLabeling/000001-010000.txt (text line with #k prosody markers
+ pinyin line pairs) into `wav|baker|sil <phones-with-prosody>` manifest
lines:
- punctuation stripped, utterance 002365 (full-width P) skipped,
- utterance 005107's `ng1` syllable corrected to `en1`,
- erhua (儿化): a 儿 char with no own `er*` syllable merges into the
  previous syllable; its prosody marker replaces the previous one,
- every char boundary gets `#0` unless a #k marker is present.

Usage: prepare_data.py lexicon.txt prosody_label_file wave_dir > all.txt
"""

import re
import sys


def parse_label_text(content: str):
    """-> (chars, {char_index: '#k'})."""
    chars = []
    prosody = {}
    i = 0
    while i < len(content):
        if content[i] == "#":
            prosody[len(chars) - 1] = content[i : i + 2]
            i += 2
        else:
            chars.append(content[i])
            i += 1
    return chars, prosody


def main():
    lexicon_path, label_path, wave_dir = sys.argv[1:4]
    lexicon = {}
    with open(lexicon_path, encoding="utf8") as f:
        for line in f:
            arr = line.strip().split()
            lexicon[arr[0]] = arr[1:]

    with open(label_path, encoding="utf8") as f:
        lines = f.readlines()

    for i in range(0, len(lines), 2):
        key = lines[i][:6]
        content = re.sub("[。，、“”？：……！（ ）—；]", "", lines[i][7:].strip())
        if "Ｐ" in content:  # corrupted utterance 002365
            continue
        syllable_line = lines[i + 1]
        if key == "005107":
            syllable_line = syllable_line.replace(" ng1", " en1")
        syllables = syllable_line.strip().split()

        chars, prosody = parse_label_text(content)
        phones = []
        s_idx = 0
        for k, char in enumerate(chars):
            erhua = (char == "儿"
                     and (s_idx == len(syllables)
                          or not syllables[s_idx].startswith("er")))
            if not erhua:
                phones.extend(lexicon[syllables[s_idx]])
                s_idx += 1
            if k in prosody:
                if erhua:
                    phones[-1] = prosody[k]
                else:
                    phones.append(prosody[k])
            else:
                phones.append("#0")
        print(f"{wave_dir}/{key}.wav|baker|sil {' '.join(phones)}")


if __name__ == "__main__":
    main()
