"""Learning-rate schedules as pure functions of fractional epoch / step.

The reference steps a torch ``CosineAnnealingWarmRestarts(T_0=epochs,
eta_min=min_lr)`` scheduler per-iteration with ``epoch + i/iters``
(reference engine/distil.py:206, tools/train_distil.py:133-135); with
T_0 == total epochs this is a single cosine period. We expose the general
warm-restarts form so configs with shorter periods behave identically.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def cosine_annealing_warm_restarts(
    base_lr: float,
    eta_min: float = 0.0,
    t_0: float = 1.0,
    t_mult: int = 1,
) -> Callable[[float], float]:
    """Return ``lr(t)`` for fractional epoch ``t`` (SGDR, Loshchilov & Hutter).

    Matches torch.optim.lr_scheduler.CosineAnnealingWarmRestarts stepped
    with fractional epochs. Implemented in jnp so it is traceable inside an
    optax update (``t`` may be a traced step count).
    """
    if t_0 <= 0:
        raise ValueError(f"t_0 must be positive, got {t_0}")
    if t_mult < 1:
        raise ValueError(f"t_mult must be >= 1, got {t_mult}")

    def lr_at(t):
        t = jnp.asarray(t, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(t, t_0)
            t_i = jnp.asarray(t_0, jnp.float32)
        else:
            n = jnp.where(
                t > 0,
                jnp.floor(jnp.log(t / t_0 * (t_mult - 1) + 1) / math.log(t_mult)),
                0.0)
            t_start = t_0 * (t_mult**n - 1) / (t_mult - 1)
            t_i = t_0 * t_mult**n
            t_cur = t - t_start
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2

    return lr_at


def poly_learning_rate(base_lr: float, curr_iter: int, max_iter: int,
                       power: float = 0.9) -> float:
    """Poly LR policy (reference utils/misc.py:15-18)."""
    return base_lr * (1 - float(curr_iter) / max_iter) ** power


def step_learning_rate(base_lr: float, epoch: int, step_epoch: int,
                       multiplier: float = 0.1) -> float:
    """Step LR policy (reference utils/misc.py:422-425)."""
    return base_lr * (multiplier ** (epoch // step_epoch))
