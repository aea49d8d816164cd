"""Training state + optimizer, mirroring the reference recipe TPU-natively.

Reference recipe (tools/train_distil.py:131-136, config/DistilBlender.yaml:
42-75): AdamW(amsgrad, lr 3e-4, wd 1e-5) + CosineAnnealingWarmRestarts
(T_0=epochs, eta_min=1e-4) stepped per iteration, grad-clip 5.0, AMP fp16
with a GradScaler. On TPU bf16 needs no loss scaling, so the GradScaler has
no equivalent; mixed precision is a dtype policy instead.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax import core as flax_core

from ..core.schedule import cosine_annealing_warm_restarts


class DistilTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: flax_core.FrozenDict
    batch_stats: flax_core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)


def make_optimizer(cfg: Any, iters_per_epoch: int) -> optax.GradientTransformation:
    """clip(5.0) -> amsgrad -> decoupled weight decay -> SGDR cosine LR."""
    base_lr = float(cfg.base_lr or 3e-4)
    min_lr = float(cfg.min_lr or 0.0)
    epochs = int(cfg.epochs or 200)
    wd = float(cfg.weight_decay or 0.0)
    max_norm = float(cfg.max_norm or 0.0)

    sgdr = cosine_annealing_warm_restarts(base_lr, eta_min=min_lr, t_0=epochs)
    schedule = lambda step: sgdr(step / max(iters_per_epoch, 1))

    parts = []
    if max_norm > 0:
        parts.append(optax.clip_by_global_norm(max_norm))
    parts.append(optax.scale_by_amsgrad())
    if wd > 0:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def create_train_state(model, example_topo, example_feats, tx,
                       rng: Optional[jax.Array] = None) -> DistilTrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(42)
    # jit: eager init dispatches op-by-op and is ~5x slower for deep models.
    variables = jax.jit(
        lambda r, t, f: model.init(r, t, f, train=False)
    )(rng, example_topo, example_feats)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax_core.FrozenDict())
    return DistilTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
