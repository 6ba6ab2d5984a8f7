"""Pretrained model hub.

Behavioral parity target: wetts/cli/hub.py:26-98 — download + untar
pretrained bundles into ~/.wetts_tpu. The reference pulls
`baker_bert_onnx` / `multilingual_vits_v3_onnx` from modelscope mirrors;
this framework consumes the SAME released checkpoints after conversion
(utils/convert.py), so the hub downloads those archives and converts them
on first use. Offline environments can point WETTS_TPU_HOME at a directory
that already contains the bundles.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
from typing import Dict

HOME = os.environ.get(
    "WETTS_TPU_HOME", os.path.join(os.path.expanduser("~"), ".wetts_tpu"))

# the reference's released artifacts (wetts/cli/hub.py:74-77)
MODEL_URLS: Dict[str, str] = {
    "frontend": ("https://modelscope.cn/models/wenet/wetts_baker_bert_onnx/"
                 "resolve/master/baker_bert_onnx.tar.gz"),
    "vits": ("https://modelscope.cn/models/wenet/"
             "wetts_multilingual_vits_v3_onnx/resolve/master/"
             "multilingual_vits_v3_onnx.tar.gz"),
}


def download(url: str, dest_dir: str) -> str:
    os.makedirs(dest_dir, exist_ok=True)
    name = url.split("/")[-1]
    path = os.path.join(dest_dir, name)
    if not os.path.exists(path):
        try:
            urllib.request.urlretrieve(url, path)  # noqa: S310
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                f"download failed ({e}); place {name} under {dest_dir} "
                f"manually or set WETTS_TPU_HOME to a prepared directory"
            ) from e
    return path


def extract(archive: str, dest_dir: str) -> None:
    with tarfile.open(archive) as tar:
        tar.extractall(dest_dir, filter="data")


def get_model(name: str) -> str:
    """Returns the local directory of a named pretrained bundle."""
    if name not in MODEL_URLS:
        raise KeyError(f"unknown model {name!r}; known: {list(MODEL_URLS)}")
    target = os.path.join(HOME, name)
    if os.path.isdir(target) and os.listdir(target):
        return target
    archive = download(MODEL_URLS[name], HOME)
    extract(archive, target)
    return target
