"""PPO critic: linear-transformer trunk + per-field scalar value heads.

Reference: Critic_Transformer (ppo_policy/model.py:285-394).  Value =
mean over fields of mean-over-sequence of Linear(V_f -> 1) applied to each
field's logits (model.py:382-394).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LinearTransformerConfig
from . import common as cm
from . import linear_transformer as lt


def init_params(rng: jax.Array, cfg: LinearTransformerConfig) -> dict:
    k_trunk, k_vals = jax.random.split(rng)
    params = lt.init_params(k_trunk, cfg)
    names = cm.field_names(cfg.n_fields)
    val_keys = jax.random.split(k_vals, cfg.n_fields)
    params["value_heads"] = {
        n: cm.init_linear(k, v, 1)
        for n, k, v in zip(names, val_keys, cfg.vocab_sizes)
    }
    return params


def value_produce(params: dict, cfg: LinearTransformerConfig, x: jax.Array,
                  *, deterministic: bool = True,
                  rng: jax.Array | None = None,
                  attn_backend: str | None = None) -> jax.Array:
    """x (B, S, n_fields) -> value (B,).  ppo_policy/model.py:345-394."""
    h = lt.forward_hidden(params, cfg, x, deterministic=deterministic,
                          rng=rng, attn_backend=attn_backend)
    logits = lt.forward_output(params, cfg, h)
    names = cm.field_names(cfg.n_fields)
    vals = [
        jnp.mean(cm.linear_scalar(params["value_heads"][n], lg), axis=1)
        for n, lg in zip(names, logits)
    ]
    return sum(vals) / len(vals)
