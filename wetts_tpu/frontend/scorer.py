"""Bridge: FrontendModel -> the `Scorer` callable used by text.frontend.

Equivalent to the reference's ONNX session inside G2pProsody
(runtime/core/frontend/g2p_prosody.cc:102-122) and the Python
`Frontend.g2p` (wetts/frontend/g2p_prosody.py:40-90): one jitted forward
over padded token ids returning softmax posteriors.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wetts_tpu.models.bert_frontend import FrontendModel

_PAD_TO = 16  # pad token count to a multiple -> few compiled shapes


class FrontendScorer:
    def __init__(self, model: FrontendModel, params):
        self.model = model
        self.params = params

        @jax.jit
        def run(ids, mask):
            phone, prosody = model.apply({"params": params}, ids, mask)
            return (jax.nn.softmax(phone, -1), jax.nn.softmax(prosody, -1))

        self._run = run

    def __call__(self, token_ids: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        t = len(token_ids)
        padded = ((t + _PAD_TO - 1) // _PAD_TO) * _PAD_TO
        ids = np.zeros((1, padded), np.int32)
        ids[0, :t] = token_ids
        mask = np.zeros((1, padded), np.int32)
        mask[0, :t] = 1
        phone, prosody = self._run(jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(phone[0, :t]), np.asarray(prosody[0, :t])
