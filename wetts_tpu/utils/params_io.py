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


def save_params_npz(path: str, params: Any) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v)
                      for k, v in flat})


def load_params_npz(path: str) -> Dict:
    data = np.load(path, allow_pickle=False)
    tree: Dict = {}
    for key in data.files:
        parts = re.findall(r"\['([^']+)'\]", key)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree
