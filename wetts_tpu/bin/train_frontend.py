"""Frontend (prosody+polyphone BERT) training entry.

Equivalent of wetts/frontend/train.py's CLI: polyphone + prosody supervision
files and dicts, frozen local BERT weights, joint-CE training with per-epoch
CV (examples/chinese_prosody_polyphone/run.sh:14-55 stage pipeline).
"""

from __future__ import annotations

import argparse
import json
import os


def get_args():
    p = argparse.ArgumentParser(description="train BERT frontend (TPU)")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--vocab", required=True, help="BERT vocab.txt")
    p.add_argument("--polyphone_file", default=None)
    p.add_argument("--polyphone_dict", default=None,
                   help="polyphone list file (one pron per line)")
    p.add_argument("--prosody_file", default=None)
    p.add_argument("--num_prosody", type=int, default=5)
    p.add_argument("--cv_polyphone_file", default=None)
    p.add_argument("--cv_prosody_file", default=None)
    p.add_argument("--bert_dir", default=None,
                   help="local HF BERT dir (config.json + pytorch_model.bin)")
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--phone_weight", type=float, default=0.5)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="random tiny BERT (smoke testing without weights)")
    return p.parse_args()


def load_bert(bert_dir, vocab_size, tiny):
    from wetts_tpu.models.bert_frontend import BertConfig, convert_hf_bert

    if tiny or bert_dir is None:
        return BertConfig.tiny(vocab_size), None
    with open(os.path.join(bert_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = BertConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2))
    import torch

    weights = None
    for name in ("pytorch_model.bin", "model.safetensors"):
        path = os.path.join(bert_dir, name)
        if os.path.exists(path):
            if name.endswith(".bin"):
                sd = torch.load(path, map_location="cpu", weights_only=False)
            else:
                from safetensors.torch import load_file

                sd = load_file(path)
            sd = {k.replace("bert.", "", 1): v.numpy()
                  for k, v in sd.items()}
            weights = convert_hf_bert(sd, cfg)
            break
    return cfg, weights


def main():
    args = get_args()
    from wetts_tpu.frontend.dataset import CharTokenizer, FrontendDataset
    from wetts_tpu.frontend.train import FrontendTrainer
    from wetts_tpu.models.bert_frontend import FrontendModel

    tokenizer = CharTokenizer(args.vocab)
    poly_dict = None
    if args.polyphone_dict:
        with open(args.polyphone_dict, encoding="utf8") as f:
            poly_dict = {line.strip(): i for i, line in enumerate(f)
                         if line.strip()}
    prosody_dict = {f"#{i}": i for i in range(args.num_prosody)}

    train_ds = FrontendDataset(tokenizer, args.polyphone_file, poly_dict,
                               args.prosody_file, prosody_dict)
    cv_ds = None
    if args.cv_polyphone_file or args.cv_prosody_file:
        cv_ds = FrontendDataset(tokenizer, args.cv_polyphone_file, poly_dict,
                                args.cv_prosody_file, prosody_dict)

    bert_cfg, bert_params = load_bert(args.bert_dir, len(tokenizer.vocab),
                                      args.tiny)
    heads, ffn = (8, 2048) if bert_cfg.hidden_size >= 768 else (
        max(2, bert_cfg.hidden_size // 26), 4 * bert_cfg.hidden_size)
    model = FrontendModel(
        num_polyphones=len(poly_dict) if poly_dict else 1,
        num_prosody=args.num_prosody, bert=bert_cfg,
        transform_heads=heads, transform_ffn=ffn)

    os.makedirs(args.model_dir, exist_ok=True)
    with open(os.path.join(args.model_dir, "config.json"), "w") as f:
        json.dump({
            "bert": bert_cfg.__dict__,
            "num_polyphones": len(poly_dict) if poly_dict else 1,
            "num_prosody": args.num_prosody,
            "transform_heads": heads, "transform_ffn": ffn,
        }, f, indent=2)

    trainer = FrontendTrainer(
        model, train_ds, cv_ds, args.model_dir, lr=args.lr,
        epochs=args.epochs, batch_size=args.batch_size,
        phone_weight=args.phone_weight, bert_params=bert_params)
    metrics = trainer.train(max_steps=args.max_steps)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
