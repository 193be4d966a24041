"""Optimizers matching the reference's torch setups via optax.

Adam (+ default betas/eps like torch), gradient clipping by global norm
(clip_grad_norm_(3), agent_pretrain.py:563), MultiStepLR / StepLR schedules
(IRL_dqn_train.py:226, AIRL.py:56, my_pretrain.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
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


def zero1(tx, mesh, params):
    """ZeRO-1 optimizer-state sharding (green-field; the reference is
    single-GPU torch.optim.Adam): wrap `tx` so every Adam-moment leaf
    (mu/nu — the pytrees mirroring `params`) lives sharded over the
    mesh's 'dp' axis per parallel/sharding.zero1_specs, cutting optimizer
    memory by dp on top of Megatron tp.

    Mechanics: grads arrive dp-REPLICATED (GSPMD psums them across the
    data batch), so the moment update `mu' = b1*mu + (1-b1)*g` partitions
    cleanly over dp — each device touches only its slice of g — and the
    only extra collective is the all-gather of the parameter DELTA before
    `apply_updates` (the classic ZeRO-1 trade: all-gather(updates) per
    step for 1/dp of the m/v memory).  `with_sharding_constraint` inside
    `update` pins the output state so the sharding persists across
    steps.  Numerics are bit-identical to the unwrapped `tx` — only
    placement changes.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from ..parallel.sharding import zero1_specs
    specs = zero1_specs(mesh, params)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec))

    def _pin(state, place):
        """Apply the per-param shardings to every state leaf that mirrors
        the params tree (mu/nu); leave scalars (count, hyperparams)
        alone."""
        pstruct = jax.tree_util.tree_structure(params)

        def walk(node):
            if jax.tree_util.tree_structure(node) == pstruct:
                return jax.tree_util.tree_map(place, node, shardings)
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*(walk(getattr(node, f))
                                    for f in node._fields))
            if isinstance(node, tuple):
                return type(node)(walk(c) for c in node)
            if isinstance(node, list):
                return [walk(c) for c in node]
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return node
        return walk(state)

    def init(p):
        state = tx.init(p)
        return _pin(state, lambda leaf, sh: jax.device_put(leaf, sh))

    def update(grads, state, p=None):
        updates, state = tx.update(grads, state, p)
        state = _pin(state, lambda leaf, sh:
                     jax.lax.with_sharding_constraint(leaf, sh))
        return updates, state

    return optax.GradientTransformation(init, update)
