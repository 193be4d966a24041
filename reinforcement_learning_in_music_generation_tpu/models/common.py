"""Shared functional building blocks (no framework, plain pytrees).

Initializers mirror torch defaults used by the reference modules:
nn.Embedding ~ N(0,1); nn.Linear ~ kaiming-uniform == U(+-1/sqrt(fan_in))
for both weight and bias; LayerNorm ones/zeros.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

FIELDS6 = ("tempo", "chord", "barbeat", "pitch", "duration", "velocity")
FIELDS7 = ("tempo", "chord", "barbeat", "type", "pitch", "duration", "velocity")


def field_names(n: int) -> Tuple[str, ...]:
    if n == 6:
        return FIELDS6
    if n == 7:
        return FIELDS7
    return tuple(f"field{i}" for i in range(n))


def fused_head_params(heads: dict, n_fields: int):
    """Concatenate the per-field output heads into one (D, sum V_f)
    matmul — the layout the fused sort-free sampler consumes.  Single
    source of truth for the packing order (field_names), shared by the
    sampler's fused_sampling branch and the continuous-batching loop."""
    names = field_names(n_fields)
    hw = jnp.concatenate([heads[n]["w"] for n in names], axis=1)
    hb = jnp.concatenate([heads[n]["b"] for n in names])
    return hw, hb


def init_linear(rng: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(rng)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def linear(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def linear_scalar(p: dict, x: jax.Array) -> jax.Array:
    """Linear(d -> 1) as multiply+reduce, returning (..., ).

    Avoids a matmul with output dimension 1: the axon TPU compiler spends
    ~3 minutes autotuning the gradient of each such matmul (measured), and
    the critic/reward models have six of them.  Elementwise VPU form
    compiles instantly and is equally fast at these sizes."""
    return jnp.sum(x * p["w"][..., 0], axis=-1) + p["b"][0]


def init_embedding(rng: jax.Array, vocab: int, dim: int, dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(rng, (vocab, dim), dtype)


def scaled_embed(table: jax.Array, ids: jax.Array) -> jax.Array:
    """nn.Embedding * sqrt(d) (dqn_policy/model.py:67-74)."""
    return table[ids] * math.sqrt(table.shape[-1])


def init_layernorm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def sinusoidal_table(max_len: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """Sinusoidal positional encoding (dqn_policy/model.py:77-92)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


def dropout(rng: jax.Array | None, x: jax.Array, rate: float,
            deterministic: bool) -> jax.Array:
    if deterministic or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def init_field_embeddings(rng: jax.Array, vocab_sizes: Sequence[int],
                          emb_sizes: Sequence[int], dtype=jnp.float32) -> dict:
    names = field_names(len(vocab_sizes))
    rngs = jax.random.split(rng, len(names))
    return {
        name: init_embedding(r, v, e, dtype)
        for name, r, v, e in zip(names, rngs, vocab_sizes, emb_sizes)
    }


def embed_fields(emb_params: dict, x: jax.Array) -> jax.Array:
    """x (..., n_fields) int -> concat of scaled per-field embeddings
    (dqn_policy/model.py:206-221)."""
    names = field_names(x.shape[-1])
    parts = [scaled_embed(emb_params[n], x[..., i]) for i, n in enumerate(names)]
    return jnp.concatenate(parts, axis=-1)


def init_field_heads(rng: jax.Array, d_model: int, vocab_sizes: Sequence[int],
                     dtype=jnp.float32) -> dict:
    names = field_names(len(vocab_sizes))
    rngs = jax.random.split(rng, len(names))
    return {n: init_linear(r, d_model, v, dtype)
            for n, r, v in zip(names, rngs, vocab_sizes)}


def apply_field_heads(heads: dict, h: jax.Array, n_fields: int) -> Tuple[jax.Array, ...]:
    """h (..., D) -> tuple of per-field logits (dqn_policy/model.py:241-249)."""
    names = field_names(n_fields)
    return tuple(linear(heads[n], h) for n in names)
