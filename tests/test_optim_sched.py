"""Optimizer/scheduler parity vs torch: SGD update math and PolynomialLR."""

import numpy as np
import jax.numpy as jnp
import torch as t

from dualsuperreslearningforsemseg_tpu.train import sgd_init, sgd_update
from dualsuperreslearningforsemseg_tpu.models import PolynomialLR


def test_sgd_matches_torch_over_steps(rng):
    lr, mom, wd = 0.01, 0.9, 0.0005
    w0 = rng.standard_normal((4, 3), dtype=np.float32)

    wt = t.nn.Parameter(t.from_numpy(w0.copy()))
    opt = t.optim.SGD([wt], lr=lr, momentum=mom, weight_decay=wd)

    params = {'w': jnp.asarray(w0)}
    bufs = sgd_init(params)

    for step in range(5):
        g = rng.standard_normal((4, 3), dtype=np.float32)
        opt.zero_grad()
        wt.grad = t.from_numpy(g.copy())
        opt.step()
        params, bufs = sgd_update(params, {'w': jnp.asarray(g)}, bufs, lr, mom, wd)
        np.testing.assert_allclose(np.asarray(params['w']), wt.detach().numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=f'step {step}')


def test_polynomial_lr_matches_torch_scheduler():
    """Golden: torch _LRScheduler semantics — base lr for the first epoch,
    then poly decay of last_epoch (reference PolynomialLR.py:23-34)."""
    base, end, power, epochs = 0.01, 0.001, 0.9, 10

    param = t.nn.Parameter(t.zeros(1))
    opt = t.optim.SGD([param], lr=base)
    from torch.optim.lr_scheduler import LRScheduler

    class TorchPolynomialLR(LRScheduler):
        def __init__(self, optimizer, max_decay_steps, end_learning_rate, power, last_epoch=-1):
            self.max_decay_steps = max_decay_steps
            self.end_learning_rate = end_learning_rate
            self.power = power
            super().__init__(optimizer, last_epoch)

        def get_lr(self):
            if self.last_epoch > 0:
                return [(b - self.end_learning_rate)
                        * ((1. - self.last_epoch / self.max_decay_steps) ** self.power)
                        + self.end_learning_rate for b in self.base_lrs]
            return self.base_lrs

    sched_t = TorchPolynomialLR(opt, epochs, end, power)
    sched_j = PolynomialLR(base, epochs, end, power)

    for epoch in range(1, epochs + 1):
        assert abs(sched_j.get_last_lr()[0] - sched_t.get_last_lr()[0]) < 1e-12, epoch
        sched_t.step()
        sched_j.step()


def test_polynomial_lr_resume_parity():
    """Resume with last_epoch=E-1 must continue the same schedule
    (reference train_or_resume.py:109-113)."""
    fresh = PolynomialLR(0.01, 100, 0.001, 0.9)
    for _ in range(30):
        fresh.step()
    resumed = PolynomialLR(0.01, 100, 0.001, 0.9, last_epoch=29)
    assert abs(fresh.get_last_lr()[0] - resumed.get_last_lr()[0]) < 1e-15
