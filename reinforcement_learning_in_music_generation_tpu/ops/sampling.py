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

from typing import NamedTuple, Optional, Sequence, Tuple

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


# ---------------------------------------------------------------------------
# Fused all-fields sampler (decode hot path)
#
# The per-field sampler above costs ~80 small XLA ops per decode step (6
# softmax chains, 4 argsorts, 6 gathers...); inside the sequential decode
# loop that op count IS the latency.  The fused form samples all six fields
# in one padded (B, nf, Vmax) chain with NO sort and NO gather: nucleus
# sorting is replaced by pairwise-comparison ranks computed in token space,
#
#   rank_i = sum_j [p_j > p_i] + [j < i][p_j == p_i]      (stable desc order)
#   csum_i = sum_j p_j * [rank_j <= rank_i]               (sorted-prefix sum)
#
# after which keep/draw/select are elementwise.  Distribution identical to
# `sample` (same renormalizations, same inverse-CDF draw; the no-top_p
# fields become top_p=inf, i.e. plain inverse-CDF categorical).  Verified
# token-exact against `sample` under a shared uniform draw
# (tests/test_sampling.py::test_fused_matches_per_field).
# ---------------------------------------------------------------------------


def _fused_layout(vocab_sizes: Sequence[int]):
    """Static gather map packing concatenated logits (B, sum V_f) into a
    padded (nf, Vmax) grid: returns (idx (nf, Vmax) int32, valid bool)."""
    import numpy as np
    nf, vmax = len(vocab_sizes), max(vocab_sizes)
    idx = np.zeros((nf, vmax), np.int32)
    valid = np.zeros((nf, vmax), bool)
    off = 0
    for f, v in enumerate(vocab_sizes):
        idx[f, :v] = np.arange(off, off + v)
        valid[f, :v] = True
        off += v
    return jnp.asarray(idx), jnp.asarray(valid)


def sample_fields_fused(rng: jax.Array, logits_cat: jax.Array,
                        vocab_sizes: Tuple[int, ...],
                        settings: Sequence[FieldSampling] = CP_SAMPLING,
                        *, greedy: bool = False,
                        uniforms: Optional[jax.Array] = None) -> jax.Array:
    """logits_cat (B, sum V_f) -> token ids (B, nf) int32.

    `uniforms` (B, nf) overrides the RNG draw (used by the parity test to
    compare token-exactly against the per-field sampler).

    Scaling note: the sort-free rank/CDF trick materializes (B, nf, Vmax,
    Vmax) pairwise tensors — O(Vmax^2) memory/compute.  At the CP vocab
    (Vmax=135) that is ~18K elements per (B, nf) and wins by a wide margin
    over per-field sort; for a much larger tokenizer (Vmax >~ 2048) prefer
    the sort-based per-field `sample_fields` above."""
    b = logits_cat.shape[0]
    nf, vmax = len(vocab_sizes), max(vocab_sizes)
    idx, valid = _fused_layout(vocab_sizes)
    padded = jnp.take(logits_cat.astype(jnp.float32), idx.reshape(-1),
                      axis=-1).reshape(b, nf, vmax)
    neg = jnp.float32(-jnp.inf)
    padded = jnp.where(valid[None], padded, neg)
    if greedy:
        return jnp.argmax(padded, axis=-1).astype(jnp.int32)

    temps = jnp.asarray([s.temperature for s in settings], jnp.float32)
    # no-top_p fields keep the whole vocab: inverse-CDF over the full
    # softmax == categorical (model.py:23-28)
    topp = jnp.asarray([s.top_p if s.top_p is not None else jnp.inf
                        for s in settings], jnp.float32)

    scaled = padded / temps[None, :, None]
    scaled = scaled - jnp.max(scaled, axis=-1, keepdims=True)
    e = jnp.where(valid[None], jnp.exp(scaled), 0.0)
    sp = e / (jnp.sum(e, axis=-1, keepdims=True) * (1.0 + 1e-5))

    pi = sp[..., :, None]                                   # (B, nf, V, 1)
    pj = sp[..., None, :]                                   # (B, nf, 1, V)
    i_ix = jnp.arange(vmax)[:, None]
    j_ix = jnp.arange(vmax)[None, :]
    before = (pj > pi) | ((pj == pi) & (j_ix < i_ix))       # j sorts before i
    rank = jnp.sum(before, axis=-1)                         # (B, nf, V)
    csum = jnp.sum(jnp.where(rank[..., None, :] <= rank[..., :, None],
                             pj, 0.0), axis=-1)             # (B, nf, V)

    keep = (csum - sp) <= topp[None, :, None]
    nkeep = jnp.sum(keep & valid[None], axis=-1)            # (B, nf)
    s_kept = jnp.sum(sp * keep, axis=-1)                    # (B, nf)
    if uniforms is None:
        uniforms = jax.random.uniform(rng, (b, nf))
    u = uniforms * s_kept
    cnt = jnp.sum((csum <= u[..., None]) & valid[None], axis=-1)
    sel_rank = jnp.minimum(cnt, nkeep - 1)                  # (B, nf)
    sel = (rank == sel_rank[..., None]) & valid[None]
    return jnp.sum(jnp.where(sel, jnp.arange(vmax)[None, None], 0),
                   axis=-1).astype(jnp.int32)
