from .loss import (
    cosine_distil_loss,
    l1_distil_loss,
    aux_hinge_loss,
    cross_entropy_cls_loss,
)
from .train_state import DistilTrainState, create_train_state, make_optimizer
from .engine import make_train_step, make_eval_step
