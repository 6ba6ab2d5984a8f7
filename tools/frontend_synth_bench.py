"""Frontend quality table on a synthetic held-out corpus.

BASELINE.md's 8 frontend rows (polyphone accuracy, prosody PW/PPH/IPH F1
on g2pM/biaobei) cannot be reproduced in this environment — the corpora
need network egress. This tool bounds that gap instead of leaving it
silent: it trains the SAME FrontendModel/FrontendTrainer/eval stack on a
seeded synthetic corpus with real generalization structure and reports
the same metric table on a HELD-OUT split.

Corpus design (so held-out scores measure generalization, not replay):
- 160 base hanzi are secretly partitioned into 4 "tone groups". Each of
  6 polyphone characters reads differently depending on the GROUP of its
  left neighbor. Train sentences reveal each base char's group through
  some polyphones; eval pairs (polyphone, left char) are unseen, so the
  model must transfer group knowledge across polyphones.
- Prosody breaks follow a deterministic grammar over word-length
  patterns (2-2 -> #1, 2-1 -> #2, clause end -> #3, sentence end -> #4);
  eval sentences are unseen word sequences.

NUMBERS FROM THIS TOOL ARE NOT COMPARABLE TO BASELINE.md: the task is
synthetic and far easier than real Mandarin polyphone/prosody. They
quantify that the training/eval machinery learns and generalizes, nothing
more. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 160
N_GROUPS = 4
POLY_CHARS = 6


def build_corpus(tmp_dir: str, seed: int = 0):
    rng = np.random.default_rng(seed)
    base = [chr(0x4E00 + i) for i in range(N_BASE)]
    group = {c: i % N_GROUPS for i, c in enumerate(base)}
    polys = [chr(0x9000 + i) for i in range(POLY_CHARS)]
    # each polyphone maps group -> pronunciation class (2-4 prons each)
    pron_table = {}
    prons = []
    for pi, p in enumerate(polys):
        n_pron = int(rng.integers(2, 5))
        names = [f"p{pi}_{k}" for k in range(n_pron)]
        prons.extend(names)
        pron_table[p] = [names[g % n_pron] for g in range(N_GROUPS)]

    def poly_line(rng):
        p = polys[rng.integers(0, POLY_CHARS)]
        left = base[rng.integers(0, N_BASE)]
        right = base[rng.integers(0, N_BASE)]
        pron = pron_table[p][group[left]]
        return f"{left}{p}{right}", p, left, pron

    # train/eval split on (polyphone, left-char) pairs: eval pairs unseen
    all_pairs = [(p, c) for p in polys for c in base]
    rng.shuffle(all_pairs)
    eval_pairs = set(all_pairs[: len(all_pairs) // 5])
    train_poly, eval_poly = [], []
    seen = set()
    while len(train_poly) < 2400 or len(eval_poly) < 500:
        sent, p, left, pron = poly_line(rng)
        line = f"{sent[0]}▁{pron}▁{sent[1]}{sent[2]}"
        if (p, left) in eval_pairs:
            if len(eval_poly) < 500 and (line not in seen):
                eval_poly.append(line)
                seen.add(line)
        elif len(train_poly) < 2400:
            train_poly.append(line)

    # prosody: word-length grammar; ranks depend only on the LENGTH
    # pattern so unseen word sequences are scoreable
    def pros_sentence(rng):
        words, ranks = [], []
        n_words = int(rng.integers(3, 7))
        for w in range(n_words):
            wlen = int(rng.integers(1, 3))
            word = "".join(base[rng.integers(0, N_BASE)]
                           for _ in range(wlen))
            words.append(word)
            if w == n_words - 1:
                ranks.append(4)
            elif w == n_words - 2:
                ranks.append(3)
            elif wlen == 2:
                ranks.append(1)
            else:
                ranks.append(2)
        return " ".join(f"{w} #{r}" for w, r in zip(words, ranks))

    train_pros = [pros_sentence(rng) for _ in range(2400)]
    eval_pros = [pros_sentence(rng) for _ in range(500)]

    vocab = (["[PAD]", "[CLS]", "[SEP]", "[UNK]"] + base + polys)
    paths = {}
    for name, content in [
            ("vocab.txt", "\n".join(vocab)),
            ("train_poly.txt", "\n".join(train_poly)),
            ("eval_poly.txt", "\n".join(eval_poly)),
            ("train_pros.txt", "\n".join(train_pros)),
            ("eval_pros.txt", "\n".join(eval_pros))]:
        paths[name] = os.path.join(tmp_dir, name)
        with open(paths[name], "w", encoding="utf8") as f:
            f.write(content)
    poly_dict = {p: i for i, p in enumerate(sorted(set(prons)))}
    pros_dict = {f"#{i}": i for i in range(5)}
    return paths, poly_dict, pros_dict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=48)
    ap.add_argument("--workdir", default="/tmp/wetts_frontend_synth")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny model; leave TPU free
    import jax.numpy as jnp

    from wetts_tpu.frontend.dataset import (CharTokenizer, FrontendDataset,
                                            IGNORE_ID)
    from wetts_tpu.frontend.eval import polyphone_accuracy, prosody_f1
    from wetts_tpu.frontend.train import FrontendTrainer
    from wetts_tpu.models.bert_frontend import BertConfig, FrontendModel

    os.makedirs(args.workdir, exist_ok=True)
    paths, poly_dict, pros_dict = build_corpus(args.workdir, args.seed)
    tok = CharTokenizer(paths["vocab.txt"])
    train_ds = FrontendDataset(
        tok, polyphone_file=paths["train_poly.txt"],
        polyphone_dict=poly_dict,
        prosody_file=paths["train_pros.txt"], prosody_dict=pros_dict)
    eval_ds = FrontendDataset(
        tok, polyphone_file=paths["eval_poly.txt"],
        polyphone_dict=poly_dict,
        prosody_file=paths["eval_pros.txt"], prosody_dict=pros_dict)

    model = FrontendModel(len(poly_dict), 5,
                          BertConfig.tiny(vocab_size=len(tok.vocab)),
                          transform_heads=2, transform_ffn=128)
    trainer = FrontendTrainer(model, train_ds, None,
                              os.path.join(args.workdir, "exp"),
                              lr=5e-4, epochs=args.epochs,
                              batch_size=args.batch_size)
    trainer.train()

    @jax.jit
    def run(ids, mask):
        return model.apply({"params": trainer.params}, ids, mask)

    poly_ref, poly_hyp = [], []
    ref_ranks, hyp_ranks = [], []
    for ids, mask, poly, pros in eval_ds.batches(args.batch_size,
                                                 shuffle=False):
        phone_logits, prosody_logits = run(jnp.asarray(ids),
                                           jnp.asarray(mask))
        phone_pred = np.asarray(phone_logits.argmax(-1))
        pros_pred = np.asarray(prosody_logits.argmax(-1))
        sel = poly != IGNORE_ID
        poly_ref.extend(poly[sel].tolist())
        poly_hyp.extend(phone_pred[sel].tolist())
        for b in range(ids.shape[0]):
            s = pros[b] != IGNORE_ID
            if s.any():
                ref_ranks.append(pros[b][s].tolist())
                hyp_ranks.append(pros_pred[b][s].tolist())

    f1 = prosody_f1(ref_ranks, hyp_ranks)
    f1_ex = prosody_f1(ref_ranks, hyp_ranks, exclude_sentence_end=True)
    print(json.dumps({
        "metric": "frontend_synthetic_heldout",
        "caveat": ("synthetic corpus — NOT comparable to BASELINE.md's "
                   "g2pM/biaobei rows (egress-gated); quantifies that the "
                   "train/eval stack learns and generalizes"),
        "polyphone_accuracy": round(
            polyphone_accuracy(poly_ref, poly_hyp), 4),
        "n_poly_eval": len(poly_ref),
        "prosody_f1": {k: round(v, 4) for k, v in f1.items()},
        "prosody_f1_excl_4": {k: round(v, 4) for k, v in f1_ex.items()},
        "epochs": args.epochs,
        "train_sentences": len(train_ds),
        "eval_sentences": len(eval_ds),
    }))


if __name__ == "__main__":
    main()
