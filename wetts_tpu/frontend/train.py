"""Frontend trainer: joint polyphone+prosody CE with ignore-index.

Behavioral parity target: wetts/frontend/train.py:31-216 —
loss = w * CE_polyphone + (1 - w) * CE_prosody (ignore_index=-100), masked
accuracy, AdamW + linear LR decay with warmup, per-epoch CV, state save.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wetts_tpu.frontend.dataset import IGNORE_ID, FrontendDataset
from wetts_tpu.models.bert_frontend import BertConfig, FrontendModel


def masked_ce_and_acc(logits: jax.Array, labels: jax.Array
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(mean CE over non-ignored, #correct, #labelled)."""
    valid = labels != IGNORE_ID
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, ce, 0.0).sum() / n
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.where(valid, pred == safe, False).sum()
    return loss, correct, valid.sum()


def make_frontend_step(model: FrontendModel, tx, phone_weight: float = 0.5):
    @jax.jit
    def train_step(params, opt_state, batch):
        ids, mask, poly, pros = batch

        def loss_fn(p):
            phone_logits, prosody_logits = model.apply(
                {"params": p}, ids, mask)
            l_p, c_p, n_p = masked_ce_and_acc(phone_logits, poly)
            l_r, c_r, n_r = masked_ce_and_acc(prosody_logits, pros)
            loss = phone_weight * l_p + (1 - phone_weight) * l_r
            return loss, {"loss": loss, "loss_phone": l_p, "loss_prosody": l_r,
                          "acc_phone": c_p / jnp.maximum(n_p, 1),
                          "acc_prosody": c_r / jnp.maximum(n_r, 1)}

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    @jax.jit
    def eval_step(params, batch):
        ids, mask, poly, pros = batch
        phone_logits, prosody_logits = model.apply({"params": params}, ids,
                                                   mask)
        _, c_p, n_p = masked_ce_and_acc(phone_logits, poly)
        _, c_r, n_r = masked_ce_and_acc(prosody_logits, pros)
        return c_p, n_p, c_r, n_r

    return train_step, eval_step


class FrontendTrainer:
    def __init__(
        self,
        model: FrontendModel,
        train_data: FrontendDataset,
        cv_data: Optional[FrontendDataset],
        model_dir: str,
        lr: float = 5e-5,
        epochs: int = 10,
        batch_size: int = 32,
        phone_weight: float = 0.5,
        warmup_ratio: float = 0.1,
        bert_params=None,
        seed: int = 42,
    ):
        self.model = model
        self.train_data = train_data
        self.cv_data = cv_data
        self.model_dir = model_dir
        self.epochs = epochs
        self.batch_size = batch_size
        os.makedirs(model_dir, exist_ok=True)

        steps_per_epoch = max(1, (len(train_data) + batch_size - 1)
                              // batch_size)
        total = steps_per_epoch * epochs
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, int(total * warmup_ratio), total, end_value=0.0)
        self.tx = optax.adamw(schedule)

        rng = jax.random.PRNGKey(seed)
        ids = jnp.ones((2, 8), jnp.int32)
        mask = jnp.ones((2, 8), jnp.int32)
        self.params = model.init({"params": rng, "dropout": rng},
                                 ids, mask)["params"]
        if bert_params is not None:
            self.params = dict(self.params)
            self.params["bert"] = bert_params
        self.opt_state = self.tx.init(self.params)
        self.train_step, self.eval_step = make_frontend_step(
            model, self.tx, phone_weight)

    def train(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        step = 0
        log_path = os.path.join(self.model_dir, "metrics.jsonl")
        last = {}
        for epoch in range(self.epochs):
            for batch in self.train_data.batches(self.batch_size, epoch):
                self.params, self.opt_state, metrics = self.train_step(
                    self.params, self.opt_state,
                    tuple(jnp.asarray(a) for a in batch))
                step += 1
                last = {k: float(v) for k, v in metrics.items()}
                if max_steps is not None and step >= max_steps:
                    self._save(last, log_path, epoch)
                    return last
            cv = self.evaluate() if self.cv_data else {}
            last.update(cv)
            self._save(last, log_path, epoch)
        return last

    def evaluate(self) -> Dict[str, float]:
        tot = np.zeros(4, np.int64)
        for batch in self.cv_data.batches(self.batch_size, 0, shuffle=False):
            out = self.eval_step(self.params,
                                 tuple(jnp.asarray(a) for a in batch))
            tot += np.array([int(x) for x in out])
        return {
            "cv_acc_phone": tot[0] / max(tot[1], 1),
            "cv_acc_prosody": tot[2] / max(tot[3], 1),
        }

    def _save(self, metrics, log_path, epoch):
        with open(log_path, "a") as f:
            f.write(json.dumps({"epoch": epoch, **metrics}) + "\n")
        with open(os.path.join(self.model_dir, "params.npz"), "wb") as f:
            flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
            np.savez(f, **{jax.tree_util.keystr(k): np.asarray(v)
                           for k, v in flat})
