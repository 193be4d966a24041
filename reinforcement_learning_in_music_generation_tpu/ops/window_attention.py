"""Sliding-window (Longformer-style) attention.

TPU replacement for the HF `LongformerModel` self-attention used by all
three discriminator/reward variants (dqn_policy/AIRL_model.py:78-90 window
50; ppo_policy/model.py:440-451 window 512; dqn_policy/discrim-pretrain.py
window 512).  Each token attends bidirectionally within +-(window//2)
positions (HF's one-sided window convention), with padding masked out.

At the reference's sequence lengths (<= 4096) and d_model 512, a banded-mask
full attention is already MXU-friendly and memory-light, so the default
implementation is a fused XLA softmax attention with a static band mask.
For long sequences a block-sparse Pallas kernel computes only the diagonal
band blocks.

`relative_key` position embeddings (AIRL_model.py:85): note that HF's
LongformerSelfAttention ignores `position_embedding_type` (it is consumed
only by BERT-style attention); the Longformer applies *absolute* learned
position embeddings at the input.  We implement the absolute behavior in the
model trunk and additionally offer a true relative_key score term here for
completeness (off by default to match effective reference behavior).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _use_pallas_band() -> bool:
    """Long-sequence band attention backend selector.

    Measured on v5e at the discrim-LM shape (B=4, S=3584, window 512):
    the flash-band Pallas kernel ties the XLA blocked form (8.5 vs 7.9 ms
    fwd+bwd; both are grid/program-latency bound at these sizes, not
    bandwidth bound — BENCH.md round-2).  XLA therefore stays the default;
    RLMG_WINDOW_BACKEND=pallas opts into the kernel (parity-tested,
    expected to win at larger S*B where DMA dominates)."""
    return os.environ.get("RLMG_WINDOW_BACKEND") == "pallas"


def band_mask(seq_len: int, one_sided_window: int, dtype=jnp.float32) -> jax.Array:
    """(S, S) additive mask: 0 inside the band, NEG_INF outside."""
    row = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    inside = jnp.abs(row - col) <= one_sided_window
    return jnp.where(inside, 0.0, NEG_INF).astype(dtype)


def window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     attention_mask: jax.Array | None,
                     *, window: int,
                     rel_emb: jax.Array | None = None,
                     block_threshold: int = 1024) -> jax.Array:
    """q,k,v: (B, H, S, D); attention_mask: (B, S) 1=keep. window = full
    window size (HF `attention_window`); one-sided = window // 2.

    Dispatches to the O(S * window) blocked implementation when the dense
    (S, S) score matrix would be large (S > block_threshold and the band is
    narrow), else computes the dense banded form.  Returns (B, H, S, D).
    """
    s = q.shape[2]
    if s > block_threshold and s > 2 * window:
        if rel_emb is None and window // 2 <= 256 and _use_pallas_band():
            from .window_attention_kernel import (pick_blocks,
                                                  window_attention_pallas)
            bf, bkv = pick_blocks(s, window)
            return window_attention_pallas(q, k, v, attention_mask, window,
                                           bf, False, bkv)
        return window_attention_blocked(q, k, v, attention_mask,
                                        window=window, rel_emb=rel_emb)
    return _window_attention_dense(q, k, v, attention_mask,
                                   window=window, rel_emb=rel_emb)


def _window_attention_dense(q, k, v, attention_mask, *, window, rel_emb):
    b, h, s, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if rel_emb is not None:
        # BERT relative_key: scores += q . E[clip(q_pos - k_pos)]
        max_rel = (rel_emb.shape[0] - 1) // 2
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        dist = jnp.clip(row - col, -max_rel, max_rel) + max_rel
        pos = rel_emb[dist]                                   # (S, S, D)
        scores += jnp.einsum("bhqd,qkd->bhqk", q, pos) * scale
    scores = scores + band_mask(s, max(1, window // 2), scores.dtype)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask > 0, 0.0, NEG_INF).astype(scores.dtype)
        scores = scores + pad[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def window_attention_blocked(q: jax.Array, k: jax.Array, v: jax.Array,
                             attention_mask: jax.Array | None,
                             *, window: int,
                             rel_emb: jax.Array | None = None,
                             block: int = 256) -> jax.Array:
    """O(S * (block + window)) memory sliding-window attention.

    Queries are processed in blocks of `block`; each block attends to keys
    in [block_start - w, block_end + w) gathered from a w-padded copy of
    k/v.  Identical numerics to the dense banded form (same mask rule).
    """
    b, h, s, d = q.shape
    w = max(1, window // 2)
    blk = max(block, w)
    pad_s = (-s) % blk
    s_pad = s + pad_s
    nb = s_pad // blk
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
    # keys/values padded by w on the left and (w + pad_s) on the right
    kp = jnp.pad(k, ((0, 0), (0, 0), (w, w + pad_s), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (w, w + pad_s), (0, 0)))
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), q.dtype)
    mp = jnp.pad(attention_mask.astype(q.dtype), ((0, 0), (w, w + pad_s)))
    if pad_s:
        # padded tail queries are masked out of every softmax row anyway
        pass

    kw = blk + 2 * w
    # static band mask within a block: query i (abs qs+i) sees key j
    # (abs qs - w + j) iff |i - j + w| <= w  <=>  0 <= j - i <= 2w
    row = jax.lax.broadcasted_iota(jnp.int32, (blk, kw), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, kw), 1)
    inside = (col >= row) & (col <= row + 2 * w)
    band = jnp.where(inside, 0.0, NEG_INF).astype(q.dtype)
    if rel_emb is not None:
        max_rel = (rel_emb.shape[0] - 1) // 2
        dist = jnp.clip(row + w - col, -max_rel, max_rel) + max_rel
        rel_block = rel_emb[dist]                      # (blk, kw, D)

    def one_block(qs):
        # STATIC slices: their gradients lower to pads (parallel, fusable)
        # instead of the serialized dynamic_update_slice accumulation a
        # lax.map over dynamic slices produces — measured 6.6x fwd cost
        # for the S=3584 discrim-LM backward before this change.
        qb = jax.lax.slice_in_dim(qp, qs, qs + blk, axis=2)
        kb = jax.lax.slice_in_dim(kp, qs, qs + kw, axis=2)
        vb = jax.lax.slice_in_dim(vp, qs, qs + kw, axis=2)
        mb = jax.lax.slice_in_dim(mp, qs, qs + kw, axis=1)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qb, kb) * scale
        if rel_emb is not None:
            scores += jnp.einsum("bhqd,qkd->bhqk", qb, rel_block) * scale
        scores = scores + band[None, None]
        scores = scores + jnp.where(mb > 0, 0.0, NEG_INF).astype(
            scores.dtype)[:, None, None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, vb)

    outs = [one_block(i * blk) for i in range(nb)]     # nb x (B, H, blk, D)
    out = jnp.concatenate(outs, axis=2)                # (B, H, s_pad, D)
    return out[:, :, :s]


# ---------------------------------------------------------------------------
# (B, S, H, D)-native layout variant — zero head transposes
# ---------------------------------------------------------------------------
#
# Same rationale as ops/linear_attention.py's bshe variant: when the
# Longformer layer tail runs through the opaque fused kernel
# (ops/ffn_block.py:attn_tail_block), the (B,S,H,D)<->(B,H,S,D) head
# transposes around the attention stop fusing and materialize.  This
# computes the identical banded softmax with einsums written for the
# head-minor layout so q/k/v/att are plain reshapes.  Autodiff (no
# custom VJP needed — same as the standard path).

def window_attention_bshe(q: jax.Array, k: jax.Array, v: jax.Array,
                          attention_mask: jax.Array | None,
                          *, window: int,
                          rel_emb: jax.Array | None = None,
                          block_threshold: int = 1024,
                          block: int = 256) -> jax.Array:
    """q,k,v: (B, S, H, D) -> (B, S, H, D); same dispatch rule as
    window_attention (dense banded vs O(S*window) blocked)."""
    s = q.shape[1]
    if s > block_threshold and s > 2 * window:
        return _window_blocked_bshe(q, k, v, attention_mask, window=window,
                                    rel_emb=rel_emb, block=block)
    return _window_dense_bshe(q, k, v, attention_mask, window=window,
                              rel_emb=rel_emb)


def _window_dense_bshe(q, k, v, attention_mask, *, window, rel_emb):
    b, s, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if rel_emb is not None:
        max_rel = (rel_emb.shape[0] - 1) // 2
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        dist = jnp.clip(row - col, -max_rel, max_rel) + max_rel
        pos = rel_emb[dist]                                   # (S, S, D)
        scores += jnp.einsum("bqhd,qkd->bhqk", q, pos) * scale
    scores = scores + band_mask(s, max(1, window // 2), scores.dtype)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask > 0, 0.0, NEG_INF).astype(scores.dtype)
        scores = scores + pad[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _window_blocked_bshe(q, k, v, attention_mask, *, window, rel_emb,
                         block=256):
    b, s, h, d = q.shape
    w = max(1, window // 2)
    blk = max(block, w)
    pad_s = (-s) % blk
    nb = (s + pad_s) // blk
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))

    qp = jnp.pad(q, ((0, 0), (0, pad_s), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (w, w + pad_s), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (w, w + pad_s), (0, 0), (0, 0)))
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), q.dtype)
    mp = jnp.pad(attention_mask.astype(q.dtype), ((0, 0), (w, w + pad_s)))

    kw = blk + 2 * w
    row = jax.lax.broadcasted_iota(jnp.int32, (blk, kw), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, kw), 1)
    inside = (col >= row) & (col <= row + 2 * w)
    band = jnp.where(inside, 0.0, NEG_INF).astype(q.dtype)
    if rel_emb is not None:
        max_rel = (rel_emb.shape[0] - 1) // 2
        dist = jnp.clip(row + w - col, -max_rel, max_rel) + max_rel
        rel_block = rel_emb[dist]                      # (blk, kw, D)

    def one_block(qs):
        qb = jax.lax.slice_in_dim(qp, qs, qs + blk, axis=1)
        kb = jax.lax.slice_in_dim(kp, qs, qs + kw, axis=1)
        vb = jax.lax.slice_in_dim(vp, qs, qs + kw, axis=1)
        mb = jax.lax.slice_in_dim(mp, qs, qs + kw, axis=1)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qb, kb) * scale
        if rel_emb is not None:
            scores += jnp.einsum("bqhd,qkd->bhqk", qb, rel_block) * scale
        scores = scores + band[None, None]
        scores = scores + jnp.where(mb > 0, 0.0, NEG_INF).astype(
            scores.dtype)[:, None, None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, vb)

    outs = [one_block(i * blk) for i in range(nb)]     # nb x (B, blk, H, D)
    out = jnp.concatenate(outs, axis=1)
    return out[:, :s]
