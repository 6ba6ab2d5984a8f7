"""Frontend bundle export + cosine verification (reference
wetts/frontend/export_onnx.py:55-113: export, optional quantization, and
torch-vs-ONNX cosine check; here: npz bundle, optional bf16 cast, and
source-vs-exported cosine check)."""

import dataclasses
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from wetts_tpu.models.bert_frontend import BertConfig, FrontendModel
from wetts_tpu.utils.params_io import load_params_npz, save_params_npz


def _make_model_dir(tmp_path):
    bert = BertConfig.tiny()
    model = FrontendModel(6, 5, bert, 2, 32)
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, ids,
                        jnp.ones_like(ids))["params"]
    mdir = tmp_path / "exp"
    mdir.mkdir()
    cfg = {"num_polyphones": 6, "num_prosody": 5,
           "bert": dataclasses.asdict(bert),
           "transform_heads": 2, "transform_ffn": 32}
    (mdir / "config.json").write_text(json.dumps(cfg))
    save_params_npz(str(mdir / "params.npz"), params)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(["[PAD]", "[CLS]", "[SEP]", "[UNK]"]
                               + [f"c{i}" for i in range(124)]))
    return model, params, mdir, vocab


def _run_export(monkeypatch, mdir, vocab, out, extra=()):
    from wetts_tpu.bin.export_frontend import main

    monkeypatch.setattr(sys, "argv", [
        "export_frontend", "--model_dir", str(mdir), "--vocab", str(vocab),
        "--out_dir", str(out), "--verify", *extra])
    main()


def test_export_roundtrip_fp32(tmp_path, monkeypatch):
    model, params, mdir, vocab = _make_model_dir(tmp_path)
    out = tmp_path / "bundle"
    _run_export(monkeypatch, mdir, vocab, out)
    reloaded = load_params_npz(str(out / "params.npz"))
    orig = jax.tree.leaves(params)
    back = jax.tree.leaves(reloaded)
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), b)
    assert (out / "vocab.txt").exists()


def test_export_bf16_verifies(tmp_path, monkeypatch):
    model, params, mdir, vocab = _make_model_dir(tmp_path)
    out = tmp_path / "bundle16"
    _run_export(monkeypatch, mdir, vocab, out, ("--bf16",))
    import ml_dtypes

    reloaded = load_params_npz(str(out / "params.npz"))
    assert all(l.dtype == ml_dtypes.bfloat16
               for l in jax.tree.leaves(reloaded)
               if np.issubdtype(l.dtype, np.floating)
               or l.dtype == ml_dtypes.bfloat16)
    # bf16 bundle still drives the model (promotes in apply)
    ids = jnp.ones((1, 8), jnp.int32)
    phone, prosody = model.apply({"params": reloaded}, ids,
                                 jnp.ones_like(ids))
    assert np.isfinite(np.asarray(phone, np.float32)).all()
