#!/usr/bin/env python
"""LJSpeech manifest preparation.

Behavioral parity target: examples/ljspeech/local/prepare_data.py — read
metadata.csv, clean + G2P each transcript (tools/cleaners.py), emit
`wavs/X.wav|ljspeech|sil <phones>` lines.

Requires a CMUdict file (e.g. cmudict.dict with lowercase word keys).
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from tools.cleaners import english_cleaners  # noqa: E402
from wetts_tpu.text.g2p_en import G2pEn  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="prepare LJSpeech data")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--cmudict", required=True,
                        help="CMU dict file (lowercase keys)")
    parser.add_argument("--use_prosody", default=True)
    args = parser.parse_args()

    g2p = G2pEn(args.cmudict)
    metadata = os.path.join(args.data_dir, "metadata.csv")
    with open(metadata, encoding="utf8") as fin, \
            open(args.output, "w", encoding="utf8") as fout:
        for row in csv.reader(fin, delimiter="|", quoting=csv.QUOTE_NONE):
            wav_path = os.path.join(args.data_dir, f"wavs/{row[0]}.wav")
            phones = english_cleaners(row[-1], g2p, args.use_prosody)
            fout.write(f"{wav_path}|ljspeech|sil {' '.join(phones)}\n")


if __name__ == "__main__":
    main()
