"""Frontend dataset/eval + BERT frontend model smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp

from wetts_tpu.frontend.dataset import (
    CharTokenizer,
    FrontendDataset,
    IGNORE_ID,
)
from wetts_tpu.frontend.eval import binary_f1, polyphone_accuracy, prosody_f1
from wetts_tpu.models.bert_frontend import BertConfig, FrontendModel


def make_tokenizer(tmp_path):
    vocab = ["[PAD]", "[CLS]", "[SEP]", "[UNK]"] + list("宋代出现了燕乐今天气怎么样")
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab), encoding="utf8")
    return CharTokenizer(str(p))


def test_polyphone_dataset(tmp_path):
    tok = make_tokenizer(tmp_path)
    poly = tmp_path / "poly.txt"
    poly.write_text("宋代出现了▁le5▁燕乐\n", encoding="utf8")
    ds = FrontendDataset(tok, polyphone_file=str(poly),
                         polyphone_dict={"le5": 7})
    assert len(ds) == 1
    e = ds.data[0]
    assert len(e.tokens) == 7  # 宋代出现了燕乐
    # the polyphone labels the last subtoken of the span ending at 了
    assert e.polyphones[4] == 7
    assert all(x == IGNORE_ID for i, x in enumerate(e.polyphones) if i != 4)
    assert all(x == IGNORE_ID for x in e.prosody)


def test_prosody_dataset(tmp_path):
    tok = make_tokenizer(tmp_path)
    pros = tmp_path / "pros.txt"
    pros.write_text("今天 #1 天气 #1 怎么样 #3\nbad line without ranks\n",
                    encoding="utf8")
    ds = FrontendDataset(tok, prosody_file=str(pros),
                         prosody_dict={f"#{i}": i for i in range(5)})
    assert len(ds) == 1
    e = ds.data[0]
    assert e.prosody == [0, 1, 0, 1, 0, 0, 3]
    assert all(x == IGNORE_ID for x in e.polyphones)


def test_collate_offsets(tmp_path):
    tok = make_tokenizer(tmp_path)
    pros = tmp_path / "pros.txt"
    pros.write_text("今天 #1 天气 #2\n怎么样 #3\n", encoding="utf8")
    ds = FrontendDataset(tok, prosody_file=str(pros),
                         prosody_dict={f"#{i}": i for i in range(5)})
    batches = list(ds.batches(4, shuffle=False))
    ids, mask, poly, pros_l = batches[0]
    assert ids[0, 0] == tok.cls_id
    # label offset by one for [CLS] (reference collate_fn:142-151)
    assert pros_l[0, 0] == IGNORE_ID
    assert pros_l[0, 2] == 1  # 今天 -> rank at second char


def test_eval_metrics():
    assert polyphone_accuracy([1, 2, 3], [1, 2, 0]) == 2 / 3
    f1 = prosody_f1([[0, 1, 0, 3]], [[0, 1, 0, 3]])
    assert f1["PW"] == 1.0 and f1["IPH"] == 1.0
    f1 = prosody_f1([[0, 1, 0, 4]], [[0, 0, 0, 4]],
                    exclude_sentence_end=True)
    assert f1["PW"] == 0.0
    assert binary_f1(np.array([1, 0, 1]), np.array([1, 1, 0])) == 0.5


def test_frontend_model_and_trainer(tmp_path):
    tok = make_tokenizer(tmp_path)
    pros = tmp_path / "pros.txt"
    pros.write_text("今天 #1 天气 #1 怎么样 #3\n" * 4, encoding="utf8")
    ds = FrontendDataset(tok, prosody_file=str(pros),
                         prosody_dict={f"#{i}": i for i in range(5)})
    from wetts_tpu.frontend.train import FrontendTrainer

    model = FrontendModel(num_polyphones=10, num_prosody=5,
                          bert=BertConfig.tiny(len(tok.vocab)),
                          transform_heads=2, transform_ffn=64)
    trainer = FrontendTrainer(model, ds, ds, str(tmp_path / "exp"),
                              epochs=1, batch_size=2)
    metrics = trainer.train(max_steps=2)
    assert np.isfinite(metrics["loss"])
    cv = trainer.evaluate()
    assert 0.0 <= cv["cv_acc_prosody"] <= 1.0


def test_bert_frozen_gradients(tmp_path):
    """BERT params must receive zero gradient (frozen, reference :30-31)."""
    tok = make_tokenizer(tmp_path)
    model = FrontendModel(num_polyphones=4, num_prosody=5,
                          bert=BertConfig.tiny(len(tok.vocab)),
                          transform_heads=2, transform_ffn=64)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((2, 6), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    params = model.init({"params": rng}, ids, mask)["params"]

    def loss(p):
        phone, prosody = model.apply({"params": p}, ids, mask)
        return (phone**2).mean() + (prosody**2).mean()

    grads = jax.grad(loss)(params)
    bert_norm = sum(float(jnp.abs(g).sum())
                    for g in jax.tree.leaves(grads["bert"]))
    transform_norm = sum(float(jnp.abs(g).sum())
                         for g in jax.tree.leaves(grads["transform"]))
    assert bert_norm == 0.0
    assert transform_norm > 0.0
