"""Hub bundle pipeline, downstream of the download.

The reference CLI's zero-config path (wetts/cli/hub.py:82-98 +
wetts/cli/model.py:64-68) downloads released tarballs, extracts them, and
loads the models by directory. This host has no egress, so these tests
exercise everything AFTER the network hop with a locally-built archive in
the exact released shape: a tar.gz wrapping one top-level directory that
holds a torch-format checkpoint + config + tables. That covers: archive
extraction, bundle-root resolution, the convert-on-load .pth path
(utils/convert.py via cli/model.py:load_params), and synthesis through the
loaded bundle.
"""

import json
import os
import tarfile

import numpy as np
import pytest
import torch

from wetts_tpu.config import Config


def _vits_bundle_dir(tmp_path):
    """Released-shape VITS bundle: <wrapper>/{config.json,G.pth,tables}."""
    from test_torch_parity import build_pair, small_cfg

    cfg = small_cfg()
    tmodel, _jmodel, _vars = build_pair(cfg, seed=3)
    wrapper = tmp_path / "multilingual_vits_v3_onnx"
    wrapper.mkdir(parents=True)
    # the reference checkpoint format: {"model": state_dict, ...}
    # (wetts/vits/utils/task.py:59-76)
    torch.save({"model": tmodel.state_dict(), "iteration": 100,
                "learning_rate": 2e-4}, wrapper / "G.pth")
    with open(wrapper / "config.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    with open(wrapper / "phones.txt", "w") as f:
        for i, ph in enumerate(["sil"] + [f"p{i}" for i in range(1, 10)]):
            f.write(f"{ph} {i}\n")
    with open(wrapper / "speaker.txt", "w") as f:
        f.write("spk0 0\nspk1 1\n")
    return wrapper


def _tar_bundle(wrapper, archive_path):
    with tarfile.open(archive_path, "w:gz") as tar:
        tar.add(wrapper, arcname=os.path.basename(wrapper))


@pytest.fixture()
def hub_home(tmp_path, monkeypatch):
    home = tmp_path / "hub_home"
    home.mkdir()
    monkeypatch.setenv("WETTS_TPU_HOME", str(home))
    return home


def test_hub_extracts_and_loads_released_shape(tmp_path, hub_home):
    from wetts_tpu.cli import hub
    from wetts_tpu.cli.model import Model

    wrapper = _vits_bundle_dir(tmp_path)
    # pre-placed archive == already-downloaded state; download() must be
    # skipped because the file exists (hub.py:36)
    _tar_bundle(wrapper, hub_home / "multilingual_vits_v3_onnx.tar.gz")

    d = hub.get_model("vits")
    assert os.path.basename(d) == "multilingual_vits_v3_onnx"
    assert os.path.exists(os.path.join(d, "G.pth"))
    # idempotent: second call resolves the cached extraction
    assert hub.get_model("vits") == d

    model = Model(d)  # exercises the torch-checkpoint convert-on-load path
    audio = model.synthesis("p1 p2 p3 p1", "spk1")
    assert audio.dtype == np.int16
    assert audio.size > 0
    assert np.abs(audio.astype(np.int64)).max() <= 32767


def test_default_model_dir_without_frontend(tmp_path, hub_home, monkeypatch):
    """Zero-config CLI path: VITS bundle resolves; a failing frontend fetch
    degrades to raw-phone mode instead of crashing (reference behavior is
    hard-required frontend; graceful degradation is this framework's
    failure-detection policy, serving/engine.py raw-phone mode)."""
    from wetts_tpu.cli import hub

    wrapper = _vits_bundle_dir(tmp_path)
    _tar_bundle(wrapper, hub_home / "multilingual_vits_v3_onnx.tar.gz")
    monkeypatch.setitem(hub.MODEL_URLS, "frontend",
                        "file:///nonexistent/frontend.tar.gz")
    d = hub.get_default_model_dir()
    assert os.path.exists(os.path.join(d, "G.pth"))
    assert not os.path.exists(os.path.join(d, "frontend"))


def test_unknown_model_name_raises():
    from wetts_tpu.cli import hub

    with pytest.raises(KeyError):
        hub.get_model("nope")
