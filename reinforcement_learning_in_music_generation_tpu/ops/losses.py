"""Loss ops shared by pretrain / RL.

Masked per-field cross-entropy matching the reference exactly:
CrossEntropyLoss(reduction='none') * mask, summed and divided by mask.sum()
(dqn_policy/model.py:109, 163-167).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def masked_cross_entropy(logits: jax.Array, targets: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """logits (B,S,V), targets (B,S) int, mask (B,S) {0,1} -> scalar.

    sum(ce * mask) / sum(mask)  (dqn_policy/model.py:163-167).
    """
    logits = logits.astype(jnp.float32)   # CE always reduces in f32
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    ce = logz - gold
    mask = mask.astype(ce.dtype)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def fields_cross_entropy(logits_per_field: Sequence[jax.Array],
                         targets: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-field masked CE, stacked.  targets (B,S,n_fields) -> (n_fields,).

    The per-field tuple mirrors LinearTransformer.train_step
    (dqn_policy/model.py:170-197); callers average (agent_pretrain.py:557-560).
    """
    losses = [
        masked_cross_entropy(lg, targets[..., i], mask)
        for i, lg in enumerate(logits_per_field)
    ]
    return jnp.stack(losses)


def binary_cross_entropy(pred: jax.Array, target: jax.Array) -> jax.Array:
    """BCE on probabilities (torch nn.BCELoss, dqn_policy/AIRL.py:43)."""
    pred = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    return -jnp.mean(target * jnp.log(pred) + (1.0 - target) * jnp.log1p(-pred))
