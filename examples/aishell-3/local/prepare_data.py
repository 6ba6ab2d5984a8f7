#!/usr/bin/env python
"""AISHELL-3 multi-speaker manifest preparation.

Behavioral parity target: examples/aishell-3/local/prepare_data.py —
parse train/label_train-set.txt (skipping the 5-line header), keep the
`%`/`$` prosody markers verbatim, map syllables through the pinyin lexicon
(hard error on OOV), emit `wav|speaker|sil <phones>` with the speaker id
taken from the utterance key prefix.

Usage: prepare_data.py lexicon.txt aishell3_dir out_manifest
"""

import os
import sys


def main():
    if len(sys.argv) != 4:
        print("Usage: prepare_data.py lexicon in_data_dir out_data")
        sys.exit(-1)
    lexicon = {}
    with open(sys.argv[1], encoding="utf8") as f:
        for line in f:
            arr = line.strip().split()
            lexicon[arr[0]] = arr[1:]

    label_file = os.path.join(sys.argv[2], "train", "label_train-set.txt")
    with open(label_file, encoding="utf8") as fin, \
            open(sys.argv[3], "w", encoding="utf8") as fout:
        lines = [x.strip() for x in fin.readlines()][5:]
        for line in lines:
            key, text, _ = line.split("|")
            speaker = key[:-4]
            wav_path = os.path.join(sys.argv[2], "train", "wav", speaker,
                                    f"{key}.wav")
            phones = []
            for tok in text.split():
                if tok in ("%", "$"):
                    phones.append(tok)
                elif tok in lexicon:
                    phones.extend(lexicon[tok])
                else:
                    print(f"{key} OOV {tok}")
                    sys.exit(-1)
            fout.write(f"{wav_path}|{speaker}|sil {' '.join(phones)}\n")


if __name__ == "__main__":
    main()
