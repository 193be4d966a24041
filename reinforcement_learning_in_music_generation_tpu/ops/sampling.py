"""On-device temperature / nucleus sampling.

The reference samples on the host: per generated token it copies logits
GPU->CPU and runs numpy softmax/sort/cumsum/np.random.choice
(dqn_policy/model.py:19-55, called per field from forward_output_sampling
model.py:282-287).  Here the identical semantics run on-device under jit so
the whole decode loop stays in one XLA program:

  * ``softmax_with_temperature``: exp(l/t)/sum(exp(l/t))  (model.py:19-21)
  * nucleus: renormalize by (sum + 1e-5), sort desc, keep tokens up to and
    including the first index where the cumulative sum exceeds p, renormalize
    the kept set, sample (model.py:31-45)
  * no-p path: plain weighted sampling from the temperature softmax
    (model.py:23-28)
  * greedy mode: argmax (used for deterministic decode verification)

Per-field default settings reproduce dqn_policy/model.py:282-287.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class FieldSampling(NamedTuple):
    temperature: float = 1.0
    top_p: Optional[float] = None


# dqn_policy/model.py:282-287 (field order: tempo chord barbeat pitch dur vel)
CP_SAMPLING: Sequence[FieldSampling] = (
    FieldSampling(1.2, 0.9),    # tempo
    FieldSampling(1.0, 0.99),   # chord
    FieldSampling(1.2, None),   # barbeat
    FieldSampling(1.0, 0.9),    # pitch
    FieldSampling(2.0, 0.9),    # duration
    FieldSampling(5.0, None),   # velocity
)

GREEDY = tuple(FieldSampling() for _ in range(6))


def softmax_with_temperature(logits: jax.Array, temperature: float) -> jax.Array:
    """Matches model.py:19-21 (incl. its lack of max-subtraction, applied in
    a numerically-safe way: subtracting the max leaves the ratio identical)."""
    scaled = logits / temperature
    scaled = scaled - jax.lax.stop_gradient(jnp.max(scaled, axis=-1, keepdims=True))
    e = jnp.exp(scaled)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def nucleus_mask(probs: jax.Array, p: float) -> jax.Array:
    """Boolean keep-mask implementing model.py:31-45.

    Keep sorted position i iff cumsum_{i-1} <= p (so the first prob that
    pushes the cumulative sum over p is still included).
    """
    probs = probs / (jnp.sum(probs, axis=-1, keepdims=True) + 1e-5)
    order = jnp.argsort(-probs, axis=-1)
    sorted_p = jnp.take_along_axis(probs, order, axis=-1)
    csum = jnp.cumsum(sorted_p, axis=-1)
    keep_sorted = (csum - sorted_p) <= p
    keep = jnp.zeros_like(keep_sorted)
    keep = jnp.put_along_axis(keep, order, keep_sorted, axis=-1, inplace=False)
    return keep


def sample(rng: jax.Array, logits: jax.Array, *, temperature: float = 1.0,
           top_p: Optional[float] = None, greedy: bool = False) -> jax.Array:
    """Sample token ids from logits (..., V) -> (...).

    The nucleus path uses a single descending sort + inverse-CDF draw in
    sorted space (then a gather through the sort order) — same distribution
    as the reference's sort/cumsum/np.random.choice, with no scatter and no
    full-vocab Gumbel pass.
    """
    if greedy:
        return jnp.argmax(logits, axis=-1)
    logits = logits.astype(jnp.float32)
    if top_p is None:
        # plain weighted sampling from the temperature softmax (model.py:23-28)
        return jax.random.categorical(rng, logits / temperature, axis=-1)
    probs = softmax_with_temperature(logits, temperature)
    order = jnp.argsort(-probs, axis=-1)
    sp = jnp.take_along_axis(probs, order, axis=-1)
    sp = sp / (jnp.sum(sp, axis=-1, keepdims=True) + 1e-5)
    csum = jnp.cumsum(sp, axis=-1)
    keep = (csum - sp) <= top_p          # incl. first prob crossing the line
    s_kept = jnp.sum(sp * keep, axis=-1, keepdims=True)
    u = jax.random.uniform(rng, probs.shape[:-1] + (1,)) * s_kept
    idx = jnp.sum((csum <= u).astype(jnp.int32), axis=-1)
    idx = jnp.minimum(idx, jnp.sum(keep, axis=-1) - 1)
    return jnp.take_along_axis(order, idx[..., None], axis=-1)[..., 0]


def sample_fields(rng: jax.Array, logits_per_field: Sequence[jax.Array],
                  settings: Sequence[FieldSampling] = CP_SAMPLING,
                  *, greedy: bool = False) -> jax.Array:
    """Sample one compound token: list of per-field logits (..., V_f) ->
    int32 (..., n_fields).  Mirrors forward_output_sampling
    (dqn_policy/model.py:259-298)."""
    rngs = jax.random.split(rng, len(logits_per_field))
    words = [
        sample(r, lg, temperature=st.temperature, top_p=st.top_p, greedy=greedy)
        for r, lg, st in zip(rngs, logits_per_field, settings)
    ]
    return jnp.stack(words, axis=-1).astype(jnp.int32)
