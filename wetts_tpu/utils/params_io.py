"""Flat .npz (de)serialization of flax param trees.

A lightweight, dependency-free artifact format for inference bundles
(Orbax remains the training checkpoint format). Keys are jax keystr paths
like "['enc_p']['proj']['kernel']".
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import numpy as np


_BF16 = "__bf16__"  # npy can't store ml_dtypes.bfloat16; use a uint16 view


def save_params_npz(path: str, params: Any) -> None:
    import ml_dtypes

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for k, v in flat:
        key = jax.tree_util.keystr(k)
        arr = np.asarray(v)
        if arr.dtype == ml_dtypes.bfloat16:
            key, arr = _BF16 + key, arr.view(np.uint16)
        out[key] = arr
    np.savez(path, **out)


def load_params_npz(path: str) -> Dict:
    import ml_dtypes

    data = np.load(path, allow_pickle=False)
    tree: Dict = {}
    for key in data.files:
        arr = data[key]
        if key.startswith(_BF16):
            arr = arr.view(ml_dtypes.bfloat16)
        parts = re.findall(r"\['([^']+)'\]", key)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree
