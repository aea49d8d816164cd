import math

import pytest

torch = pytest.importorskip("torch")

from dropclip_tpu.core.schedule import (
    cosine_annealing_warm_restarts,
    poly_learning_rate,
)


def test_cosine_warm_restarts_matches_torch():
    """Golden test vs torch.optim CosineAnnealingWarmRestarts stepped with
    fractional epochs — the reference's exact usage
    (tools/train_distil.py:133-135, engine/distil.py:206)."""
    base_lr, min_lr, t0 = 3e-4, 1e-4, 20
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, eta_min=min_lr)
    ours = cosine_annealing_warm_restarts(base_lr, eta_min=min_lr, t_0=t0)

    iters = 7
    for epoch in range(30):
        for i in range(iters):
            t = epoch + i / iters
            sched.step(t)
            torch_lr = opt.param_groups[0]["lr"]
            # rel_tol 1e-6: ours evaluates in float32 (traceable inside optax)
            assert math.isclose(ours(t), torch_lr, rel_tol=1e-6), (t, ours(t), torch_lr)


def test_cosine_endpoints():
    f = cosine_annealing_warm_restarts(1.0, eta_min=0.1, t_0=10)
    assert math.isclose(f(0.0), 1.0, rel_tol=1e-6)
    assert math.isclose(f(5.0), 0.55, rel_tol=1e-6)
    assert f(9.999) < 0.11


def test_poly():
    assert math.isclose(poly_learning_rate(1.0, 0, 100), 1.0)
    assert poly_learning_rate(1.0, 50, 100) < 1.0
