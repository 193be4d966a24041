"""Optimizers matching the reference's torch setups via optax.

Adam (+ default betas/eps like torch), gradient clipping by global norm
(clip_grad_norm_(3), agent_pretrain.py:563), MultiStepLR / StepLR schedules
(IRL_dqn_train.py:226, AIRL.py:56, my_pretrain.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def multistep_lr(init_lr: float, milestones: Sequence[int],
                 gamma: float = 0.1) -> optax.Schedule:
    """torch MultiStepLR: lr * gamma^(#milestones passed)."""
    return optax.piecewise_constant_schedule(
        init_lr, {int(m): gamma for m in sorted(milestones)})


def step_lr(init_lr: float, step_size: int, gamma: float = 0.1) -> optax.Schedule:
    """torch StepLR: decay every `step_size` steps."""
    def schedule(count):
        return init_lr * (gamma ** (count // step_size))
    return schedule


def adam(lr, *, grad_clip: Optional[float] = None,
         b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    tx = []
    if grad_clip is not None:
        tx.append(optax.clip_by_global_norm(grad_clip))
    tx.append(optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=b1, b2=b2, eps=eps))
    return optax.chain(*tx)
