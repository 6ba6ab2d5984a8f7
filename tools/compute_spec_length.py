#!/usr/bin/env python
"""Precompute spectrogram frame counts as the manifest's 4th column.

Equivalent of the reference tools/compute_spec_length.py:18-72: a thread
pool reads each wav header, computes frames = samples // hop, and appends
`|frames` so the dataset filter can skip its byte-size estimation pass
(data_utils.py:61-86).
"""

import argparse
import concurrent.futures
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wetts_tpu.utils.wav import read_wav  # noqa: E402


def frames_for(path: str, hop: int, target_rate: int) -> int:
    wav, rate = read_wav(path)
    n = wav.shape[-1]
    if rate != target_rate:
        n = int(n * target_rate / rate)
    return n // hop


def main():
    p = argparse.ArgumentParser()
    p.add_argument("manifest")
    p.add_argument("output")
    p.add_argument("--hop_length", type=int, default=256)
    p.add_argument("--sampling_rate", type=int, default=22050)
    p.add_argument("--num_threads", type=int, default=8)
    args = p.parse_args()

    with open(args.manifest, encoding="utf8") as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]

    def job(line):
        wav_path = line.split("|")[0]
        try:
            return frames_for(wav_path, args.hop_length, args.sampling_rate)
        except Exception:  # noqa: BLE001
            return -1

    with concurrent.futures.ThreadPoolExecutor(args.num_threads) as ex:
        lengths = list(ex.map(job, lines))
    with open(args.output, "w", encoding="utf8") as f:
        for line, n in zip(lines, lengths):
            if n >= 0:
                f.write(f"{line}|{n}\n")


if __name__ == "__main__":
    main()
