"""Frontend evaluation entry: polyphone accuracy + prosody PW/PPH/IPH F1.

Equivalent of wetts/frontend/test_polyphone.py and test_prosody.py:56-103.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def get_args():
    p = argparse.ArgumentParser(description="eval BERT frontend")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--polyphone_file", default=None)
    p.add_argument("--polyphone_dict", default=None)
    p.add_argument("--prosody_file", default=None)
    p.add_argument("--num_prosody", type=int, default=5)
    p.add_argument("--exclude_sentence_end", action="store_true")
    p.add_argument("--batch_size", type=int, default=32)
    return p.parse_args()


def main():
    args = get_args()
    import jax.numpy as jnp

    from wetts_tpu.frontend.dataset import (
        CharTokenizer,
        FrontendDataset,
        IGNORE_ID,
    )
    from wetts_tpu.frontend.eval import prosody_f1
    from wetts_tpu.models.bert_frontend import BertConfig, FrontendModel
    from wetts_tpu.utils.params_io import load_params_npz

    with open(os.path.join(args.model_dir, "config.json")) as f:
        mc = json.load(f)
    model = FrontendModel(mc["num_polyphones"], mc["num_prosody"],
                          BertConfig(**mc["bert"]),
                          mc.get("transform_heads", 8),
                          mc.get("transform_ffn", 2048))
    params = load_params_npz(os.path.join(args.model_dir, "params.npz"))

    tokenizer = CharTokenizer(args.vocab)
    poly_dict = None
    if args.polyphone_dict:
        with open(args.polyphone_dict, encoding="utf8") as f:
            poly_dict = {line.strip(): i for i, line in enumerate(f)
                         if line.strip()}
    prosody_dict = {f"#{i}": i for i in range(args.num_prosody)}
    ds = FrontendDataset(tokenizer, args.polyphone_file, poly_dict,
                         args.prosody_file, prosody_dict)

    import jax

    @jax.jit
    def run(ids, mask):
        return model.apply({"params": params}, ids, mask)

    poly_correct = poly_total = 0
    ref_ranks, hyp_ranks = [], []
    for ids, mask, poly, pros in ds.batches(args.batch_size, shuffle=False):
        phone_logits, prosody_logits = run(jnp.asarray(ids),
                                           jnp.asarray(mask))
        phone_pred = np.asarray(phone_logits.argmax(-1))
        prosody_pred = np.asarray(prosody_logits.argmax(-1))
        valid_p = poly != IGNORE_ID
        poly_correct += int((phone_pred[valid_p] == poly[valid_p]).sum())
        poly_total += int(valid_p.sum())
        for b in range(ids.shape[0]):
            sel = pros[b] != IGNORE_ID
            if sel.any():
                ref_ranks.append(pros[b][sel].tolist())
                hyp_ranks.append(prosody_pred[b][sel].tolist())

    out = {}
    if poly_total:
        out["polyphone_accuracy"] = poly_correct / poly_total
    if ref_ranks:
        out.update(prosody_f1(ref_ranks, hyp_ranks,
                              args.exclude_sentence_end))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
