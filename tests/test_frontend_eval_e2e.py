"""Frontend train->eval wiring sanity on a synthetic known-answer corpus.

BASELINE.md's polyphone-accuracy / prosody-F1 rows can't be reproduced here
(the g2pM/biaobei corpora need egress), so this de-risks the scorer/eval
wiring instead: a tiny BERT memorizes a deterministic synthetic corpus, and
the SAME prediction path bin/eval_frontend.py uses (argmax over IGNORE_ID-
masked positions -> eval.polyphone_accuracy / eval.prosody_f1) must come
back ~1.0. A label-alignment bug anywhere in dataset/train/eval would show
up as chance-level metrics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wetts_tpu.frontend.dataset import (
    CharTokenizer,
    FrontendDataset,
    IGNORE_ID,
)
from wetts_tpu.frontend.eval import polyphone_accuracy, prosody_f1
from wetts_tpu.frontend.train import FrontendTrainer
from wetts_tpu.models.bert_frontend import BertConfig, FrontendModel

CHARS = "的了地得着中国人民天气今明晚早好大小多少"


def make_corpus(tmp_path):
    vocab = ["[PAD]", "[CLS]", "[SEP]", "[UNK]"] + list(CHARS)
    (tmp_path / "vocab.txt").write_text("\n".join(vocab), encoding="utf8")
    # polyphone: 的 reads de5 after 好, di4 otherwise — deterministic rule
    # a 2-layer model can memorize
    poly_lines = []
    for left in "中国人民天气":
        poly_lines.append(f"好{left}▁de5▁的")
        poly_lines.append(f"{left}好▁di4▁的")
    (tmp_path / "poly.txt").write_text("\n".join(poly_lines),
                                       encoding="utf8")
    # prosody: boundary rank depends deterministically on the left word
    pros_lines = []
    for a, b in [("今天", "天气"), ("明天", "天气"), ("中国", "人民")]:
        pros_lines.append(f"{a} #1 {b} #3")
        pros_lines.append(f"{b} #2 {a} #4")
    (tmp_path / "pros.txt").write_text("\n".join(pros_lines),
                                       encoding="utf8")
    return tmp_path


def test_frontend_train_eval_roundtrip(tmp_path):
    make_corpus(tmp_path)
    tok = CharTokenizer(str(tmp_path / "vocab.txt"))
    poly_dict = {"de5": 0, "di4": 1}
    pros_dict = {f"#{i}": i for i in range(5)}
    ds = FrontendDataset(tok, polyphone_file=str(tmp_path / "poly.txt"),
                         polyphone_dict=poly_dict,
                         prosody_file=str(tmp_path / "pros.txt"),
                         prosody_dict=pros_dict)
    model = FrontendModel(len(poly_dict), 5,
                          BertConfig.tiny(vocab_size=len(tok.vocab)),
                          transform_heads=2, transform_ffn=64)
    trainer = FrontendTrainer(model, ds, None, str(tmp_path / "exp"),
                              lr=1e-3, epochs=120, batch_size=12)
    trainer.train()

    # eval through the same path bin/eval_frontend.py drives
    @jax.jit
    def run(ids, mask):
        return model.apply({"params": trainer.params}, ids, mask)

    poly_ref, poly_hyp = [], []
    ref_ranks, hyp_ranks = [], []
    for ids, mask, poly, pros in ds.batches(12, shuffle=False):
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

    acc = polyphone_accuracy(poly_ref, poly_hyp)
    f1 = prosody_f1(ref_ranks, hyp_ranks)
    assert acc >= 0.9, (acc, poly_ref, poly_hyp)
    assert f1["PW"] >= 0.9 and f1["PPH"] >= 0.9 and f1["IPH"] >= 0.9, f1
    # exclude-final-#4 variant exercises the test_prosody.py:95-102 switch
    f1_ex = prosody_f1(ref_ranks, hyp_ranks, exclude_sentence_end=True)
    assert f1_ex["PW"] >= 0.9
