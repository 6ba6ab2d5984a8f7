"""Checkpointing via Orbax.

Replaces the reference's four .pth families (G_/D_/DUR_/WD_*.pth, each with
{model, optimizer, iteration, learning_rate}; wetts/vits/utils/task.py:31-102)
with ONE Orbax step directory holding the whole GANTrainState, the same
resume-latest semantics (numeric step discovery), and the same
partial-load tolerance (missing keys keep freshly-initialized values,
task.py:43-49) via a restore that merges into an existing state tree.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from wetts_tpu.train.state import GANTrainState


def _manager(model_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(model_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(model_dir: str, state: GANTrainState, step: int,
                    max_to_keep: int = 5) -> None:
    mgr = _manager(model_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(model_dir: str) -> Optional[int]:
    if not os.path.isdir(model_dir):
        return None
    mgr = _manager(model_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_checkpoint(model_dir: str, state: GANTrainState,
                    step: Optional[int] = None) -> GANTrainState:
    """Restore into the given (abstract or concrete) state tree.

    Missing subtrees keep their current values — mirrors the reference's
    tolerant load (task.py:43-49) used for architecture-evolved resume.
    """
    mgr = _manager(model_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return state
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(state, strict=False))
    mgr.close()
    return restored
