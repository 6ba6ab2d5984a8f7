"""Hub bundle pipeline, downstream of the download.

The reference publishes two artifact families per model (README.md:63-66):
checkpoint releases (`*_exp.tar.gz`, numbered training checkpoints) and
runtime releases (`*_onnx.tar.gz`, `final.onnx` + tables —
wetts/cli/model.py:24-68, cli/frontend.py:22-32). This host has no egress,
so these tests exercise everything AFTER the network hop with locally-built
archives in the released shapes:

- a `multilingual_vits_v3_exp` bundle: one wrapper dir holding NUMBERED
  torch checkpoints (G_90000.pth + D_90000.pth), config + tables — the
  layout the hub's default "vits" entry now downloads,
- a `*_onnx` bundle: `final.onnx` whose initializers are the state-dict
  tensors with weight norm folded (export_onnx.py:80-82), read back by the
  dependency-free importer (utils/onnx_import.py),
- a frontend `baker_bert_onnx` bundle: BERT final.onnx + vocab + lexicon.
"""

import json
import os
import tarfile

import numpy as np
import pytest
import torch

from onnx_writer import write_initializers_onnx


def _write_tables(wrapper):
    with open(wrapper / "phones.txt", "w") as f:
        for i, ph in enumerate(["sil"] + [f"p{i}" for i in range(1, 10)]):
            f.write(f"{ph} {i}\n")
    with open(wrapper / "speaker.txt", "w") as f:
        f.write("spk0 0\nspk1 1\n")


def _vits_exp_bundle_dir(tmp_path):
    """Released-shape checkpoint bundle: <wrapper>/{G_<step>.pth,
    D_<step>.pth, config.json, tables} (training-dir layout,
    wetts/vits/utils/task.py:59-76 + examples/*/run.sh)."""
    from test_torch_parity import build_pair, small_cfg

    cfg = small_cfg()
    tmodel, _jmodel, _vars = build_pair(cfg, seed=3)
    wrapper = tmp_path / "multilingual_vits_v3_exp"
    wrapper.mkdir(parents=True)
    for step in (50000, 90000):
        torch.save({"model": tmodel.state_dict(), "iteration": step,
                    "learning_rate": 2e-4}, wrapper / f"G_{step}.pth")
    # discriminator checkpoint rides along in real releases; must be ignored
    torch.save({"model": {}, "iteration": 90000}, wrapper / "D_90000.pth")
    with open(wrapper / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    _write_tables(wrapper)
    return wrapper, tmodel, cfg


def _tar_bundle(wrapper, archive_path):
    with tarfile.open(archive_path, "w:gz") as tar:
        tar.add(wrapper, arcname=os.path.basename(wrapper))


@pytest.fixture()
def hub_home(tmp_path, monkeypatch):
    home = tmp_path / "hub_home"
    home.mkdir()
    monkeypatch.setenv("WETTS_TPU_HOME", str(home))
    return home


def test_hub_extracts_and_loads_exp_release(tmp_path, hub_home):
    from wetts_tpu.cli import hub
    from wetts_tpu.cli.model import Model

    wrapper, _tmodel, _cfg = _vits_exp_bundle_dir(tmp_path)
    # pre-placed archive == already-downloaded state; download() must be
    # skipped because the file exists (hub.py download cache check)
    _tar_bundle(wrapper, hub_home / "multilingual_vits_v3_exp.tar.gz")

    d = hub.get_model("vits")
    assert os.path.basename(d) == "multilingual_vits_v3_exp"
    assert os.path.exists(os.path.join(d, "G_90000.pth"))
    # idempotent: second call resolves the cached extraction
    assert hub.get_model("vits") == d

    # numbered-checkpoint load picks the HIGHEST step (task.py:98-102)
    from wetts_tpu.cli.model import _latest_g_pth

    assert _latest_g_pth(d).endswith("G_90000.pth")

    model = Model(d)  # exercises the torch-checkpoint convert-on-load path
    audio = model.synthesis("p1 p2 p3 p1", "spk1")
    assert audio.dtype == np.int16
    assert audio.size > 0
    assert np.abs(audio.astype(np.int64)).max() <= 32767


def test_onnx_release_import_parity(tmp_path):
    """A released-shape `final.onnx` (folded weight norm, state-dict
    initializer names) must load AND synthesize exactly what the
    checkpoint-converted model synthesizes."""
    import jax
    import jax.numpy as jnp

    from test_torch_parity import build_pair, small_cfg
    from wetts_tpu.cli.model import load_params
    from wetts_tpu.models.synthesizer import Synthesizer

    cfg = small_cfg()
    tmodel, jmodel, variables = build_pair(cfg, seed=4)
    # the reference export folds weight norm before export
    # (export_onnx.py:80-82) and traces export_forward, which never touches
    # enc_q — drop those tensors to mirror the real initializer set
    tmodel.flow.remove_weight_norm()
    tmodel.dec.remove_weight_norm()
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()
          if not k.startswith("enc_q.")
          and not k.startswith("dp.flows.1.")}  # dropped "useless" vflow
    bundle = tmp_path / "multilingual_vits_v3_onnx"
    bundle.mkdir()
    write_initializers_onnx(str(bundle / "final.onnx"), sd)
    with open(bundle / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    _write_tables(bundle)

    cfg.num_phones = 10
    cfg.num_speakers = 2
    loaded = load_params(str(bundle), cfg)

    rng = np.random.default_rng(0)
    x = rng.integers(1, 10, size=(1, 7))
    xl = np.array([7])
    sid = np.array([1])

    def infer(params):
        return jmodel.apply(
            params, jnp.asarray(x), jnp.asarray(xl), jnp.asarray(sid),
            0.0, 1.0, 0.0, 64, method=Synthesizer.infer,
            rngs={"noise": jax.random.PRNGKey(0)})

    # reference model for this cfg was built with num_phones=24/speakers=3;
    # rebuild the baseline from the same converted variables instead
    a_ckpt, l_ckpt, _ = infer(variables)
    a_onnx, l_onnx, _ = infer(loaded)
    np.testing.assert_array_equal(np.asarray(l_onnx), np.asarray(l_ckpt))
    np.testing.assert_allclose(np.asarray(a_onnx), np.asarray(a_ckpt),
                               atol=2e-5)


def test_frontend_onnx_release_loads(tmp_path):
    """A released-shape frontend bundle (BERT final.onnx + vocab + lexicon)
    loads through the initializer importer and produces phones."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    from wetts_tpu.cli.model import _load_frontend

    torch.manual_seed(0)
    hidden, heads = 64, 1  # convert_frontend_torch infers heads=hidden//64
    bert = BertModel(HFBertConfig(
        vocab_size=64, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=heads, intermediate_size=128,
        max_position_embeddings=32))
    transform = torch.nn.TransformerEncoderLayer(
        d_model=hidden, nhead=8, dim_feedforward=96, batch_first=True)
    phone_cls = torch.nn.Linear(hidden, 6)
    prosody_cls = torch.nn.Linear(hidden, 5)
    sd = {f"bert.{k}": v for k, v in bert.state_dict().items()}
    sd.update({f"transform.{k}": v for k, v in transform.state_dict().items()})
    sd.update({f"phone_classifier.{k}": v
               for k, v in phone_cls.state_dict().items()})
    sd.update({f"prosody_classifier.{k}": v
               for k, v in prosody_cls.state_dict().items()})
    sd = {k: v.detach().numpy().copy() for k, v in sd.items()}

    bundle = tmp_path / "baker_bert_onnx"
    (bundle / "lexicon").mkdir(parents=True)
    write_initializers_onnx(str(bundle / "final.onnx"), sd)
    chars = ["[CLS]", "[SEP]", "[UNK]", "你", "好", "了"]
    with open(bundle / "vocab.txt", "w") as f:
        f.write("\n".join(chars) + "\n")
    with open(bundle / "lexicon" / "polyphone.txt", "w") as f:
        f.write("ni3\nhao3\nle5\nliao3\nla1\nlo5\n")
    with open(bundle / "lexicon" / "pinyin_dict.txt", "w") as f:
        f.write("你 ni3\n好 hao3\n了 le5,liao3\n")
    with open(bundle / "lexicon" / "lexicon.txt", "w") as f:
        f.write("ni3 n i3\nhao3 h ao3\nle5 l e5\nliao3 l iao3\n")

    fe = _load_frontend(str(bundle))
    phones = fe.compute("你好了")
    assert phones, "frontend produced no phones"
    assert phones[-1] == "#4"
    assert "n" in phones and "i3" in phones

    # torch parity of the imported scorer posteriors
    ids = np.array([0, 3, 4, 5, 1], np.int64)
    bert.eval(), transform.eval()
    with torch.no_grad():
        t_ids = torch.from_numpy(ids)[None, :]
        h = bert(input_ids=t_ids,
                 attention_mask=torch.ones_like(t_ids),
                 token_type_ids=torch.zeros_like(t_ids)).last_hidden_state
        h = transform(h)
        t_phone = torch.softmax(phone_cls(h), -1)[0].numpy()
        t_prosody = torch.softmax(prosody_cls(h), -1)[0].numpy()
    j_phone, j_prosody = fe.scorer(ids)
    np.testing.assert_allclose(j_phone, t_phone, atol=2e-5)
    np.testing.assert_allclose(j_prosody, t_prosody, atol=2e-5)


def test_default_model_dir_without_frontend(tmp_path, hub_home, monkeypatch):
    """Zero-config CLI path: VITS bundle resolves; a failing frontend fetch
    degrades to raw-phone mode instead of crashing (reference behavior is
    hard-required frontend; graceful degradation is this framework's
    failure-detection policy, serving/engine.py raw-phone mode)."""
    from wetts_tpu.cli import hub

    wrapper, _tm, _cfg = _vits_exp_bundle_dir(tmp_path)
    _tar_bundle(wrapper, hub_home / "multilingual_vits_v3_exp.tar.gz")
    monkeypatch.setitem(
        hub.MODEL_URLS, "frontend",
        ("file:///nonexistent/frontend.tar.gz", "frontend.tar.gz"))
    d = hub.get_default_model_dir()
    assert os.path.exists(os.path.join(d, "G_90000.pth"))
    assert not os.path.exists(os.path.join(d, "frontend"))


def test_unknown_model_name_raises():
    from wetts_tpu.cli import hub

    with pytest.raises(KeyError):
        hub.get_model("nope")


def test_onnx_release_without_config_uses_vendored(tmp_path, monkeypatch):
    """The real runtime bundles ship NO config.json (final.onnx + tables
    only — wetts/cli/model.py:24-41); Model must fall back to the vendored
    release config. Exercised at test size by pointing the asset resolver
    at a matching tiny config."""
    import jax

    from test_torch_parity import build_pair, small_cfg
    from wetts_tpu.cli.model import Model

    cfg = small_cfg()
    tmodel, _jm, _vars = build_pair(cfg, seed=5)
    tmodel.flow.remove_weight_norm()
    tmodel.dec.remove_weight_norm()
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()
          if not k.startswith("enc_q.") and not k.startswith("dp.flows.1.")}
    bundle = tmp_path / "multilingual_vits_v3_onnx"
    bundle.mkdir()
    write_initializers_onnx(str(bundle / "final.onnx"), sd)
    _write_tables(bundle)  # no config.json on purpose

    cfg_file = tmp_path / "vendored.json"
    with open(cfg_file, "w") as f:
        json.dump(cfg.to_dict(), f)
    import wetts_tpu.assets as assets_mod

    monkeypatch.setattr(assets_mod, "asset_path",
                        lambda *parts: str(cfg_file))
    model = Model(str(bundle))
    audio = model.synthesis("p1 p2 p3", "spk0")
    assert audio.size > 0
