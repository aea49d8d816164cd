"""Checkpoint / resume with the reference's policy, on orbax.

Reference policy (tools/train_distil.py:195-216, 255-271): save
{epoch, model, optimizer, scheduler, scaler} each epoch as ``last_model``,
copy to ``best_sim_loss_model`` when val sim loss improves; resume restores
everything. TPU equivalents: the scheduler is a pure function of step (no
state) and bf16 needs no GradScaler, so the payload is
{step, params, batch_stats, opt_state, best_val}.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

LAST_NAME = "last_model"
BEST_NAME = "best_sim_loss_model"


def _ckptr() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(save_dir: str, state: Any, name: str = LAST_NAME,
                    best: bool = False) -> None:
    """Save ``state`` (a pytree) under save_dir/name; optionally mirror to
    the best-model name. Only process 0 writes (orbax handles multihost)."""
    save_dir = os.path.abspath(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    ckptr = _ckptr()
    ckptr.save(os.path.join(save_dir, name), state, force=True)
    if best:
        ckptr.save(os.path.join(save_dir, BEST_NAME), state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(save_dir: str, target: Any,
                       name: str = LAST_NAME) -> Optional[Any]:
    """Restore into the structure of ``target``; None if no checkpoint."""
    path = os.path.join(os.path.abspath(save_dir), name)
    if not os.path.isdir(path):
        return None
    ckptr = _ckptr()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)
