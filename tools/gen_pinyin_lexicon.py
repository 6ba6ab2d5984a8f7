#!/usr/bin/env python
"""Generate the Mandarin pinyin lexicon + phone set.

CLI-compatible with the reference tool (tools/gen_pinyin_lexicon.py:184-213);
backed by wetts_tpu.text.pinyin (entry-identical output, verified by
tests/test_pinyin.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wetts_tpu.text.pinyin import write_lexicon_files  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Generate lexicon for Chinese pinyin to phoneme")
    parser.add_argument("lexicon", type=str)
    parser.add_argument("phones", type=str)
    parser.add_argument("--with-zero-initial", action="store_true")
    parser.add_argument("--with-tone", action="store_true")
    parser.add_argument("--with-r", action="store_true")
    args = parser.parse_args()
    write_lexicon_files(args.lexicon, args.phones,
                        with_zero_initial=args.with_zero_initial,
                        with_tone=args.with_tone,
                        with_erhua=args.with_r)
    print("Done!")


if __name__ == "__main__":
    main()
