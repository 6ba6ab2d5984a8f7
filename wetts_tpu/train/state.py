"""Train state: parameter/optimizer trees for the GAN quartet.

The reference trains up to four networks with four AdamW optimizers
(G, D, duration-D, WavLM-D; wetts/vits/train.py:228-257), each with
lr=2e-4, betas=(0.8, 0.99), eps=1e-9, torch-default weight_decay=0.01, and a
per-epoch ExponentialLR decay gamma=0.999875 (train.py:285-299).

Here all four live in ONE pytree (`GANTrainState`) so a single Orbax
checkpoint holds everything (SURVEY §5 checkpoint note), and the learning
rate is an explicit state field consumed via optax.inject_hyperparams — the
host loop sets lr = lr0 * gamma^(epoch-1) to reproduce the reference
schedule.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from wetts_tpu.config import Config


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=t.learning_rate,
        b1=t.betas[0],
        b2=t.betas[1],
        eps=t.eps,
        weight_decay=0.01,  # torch AdamW default (reference uses defaults)
    )


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    params_g: Any
    opt_g: Any
    params_d: Any
    opt_d: Any
    params_dur_d: Optional[Any] = None
    opt_dur_d: Optional[Any] = None
    params_wd: Optional[Any] = None
    opt_wd: Optional[Any] = None

    @classmethod
    def create(cls, tx, params_g, params_d, params_dur_d=None,
               params_wd=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g,
            opt_g=tx.init(params_g),
            params_d=params_d,
            opt_d=tx.init(params_d),
            params_dur_d=params_dur_d,
            opt_dur_d=tx.init(params_dur_d) if params_dur_d is not None else None,
            params_wd=params_wd,
            opt_wd=tx.init(params_wd) if params_wd is not None else None,
        )


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning_rate hyperparam in-place (pytree-safe)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def epoch_lr(cfg: Config, epoch: int) -> float:
    """lr for `epoch` (1-based), matching torch ExponentialLR semantics."""
    return cfg.train.learning_rate * (cfg.train.lr_decay ** (epoch - 1))
