"""Flash-style Pallas TPU kernel for sliding-window (band) attention.

Replaces the XLA blocked form (ops/window_attention.py:
window_attention_blocked) on the long-sequence paths — the discrim-pretrain
LM trains at S=3584 / window 512 (dqn_policy/discrim-pretrain.py:239-249),
where the XLA op runs ~10-20x off the band roofline because each query
block materializes a (blk, blk+2w) score matrix in HBM and the softmax
round-trips it.

Design (standard flash attention restricted to the band):

  * forward: grid (B*H, nq); each program computes one query block against
    its 3 neighbor key/value blocks (radius 1: requires block >= one-sided
    window), softmax in VMEM, writes out + the per-row logsumexp (LSE);
  * backward dq: same grid, recomputes P = exp(S - LSE), uses the
    precomputed row dot D = sum(dO * O) for the softmax gradient;
  * backward dk/dv: grid over KEY blocks; each program accumulates the
    contributions of its 3 neighbor query blocks, so no scatter/atomics.

All matmuls hit the MXU in f32 accumulation; masks (band + padding) are
recomputed from absolute positions in-kernel.  Numerics match the XLA
dense/banded form (tests/test_window_attention_kernel.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

NEG_INF = -1e9


def _band_scores(q, k, scale, qpos, kpos, kmask, w):
    """(blk_q, D) x (blk_k, D) -> masked f32 scores (blk_q, blk_k)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    inside = jnp.abs(qpos[:, None] - kpos[None, :]) <= w
    keep = inside & (kmask[None, :] > 0)
    return jnp.where(keep, s, NEG_INF)


def _fwd_kernel(q_ref, k0_ref, k1_ref, k2_ref, v0_ref, v1_ref, v2_ref,
                m0_ref, m1_ref, m2_ref, o_ref, lse_ref,
                *, blk: int, w: int, nb: int, scale: float):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)                    # (blk, D)
    qpos = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk,), 0)

    parts = []
    for j, (k_ref, v_ref, m_ref) in enumerate(
            ((k0_ref, v0_ref, m0_ref), (k1_ref, v1_ref, m1_ref),
             (k2_ref, v2_ref, m2_ref))):
        kv_idx = jnp.clip(i + j - 1, 0, nb - 1)
        kpos = kv_idx * blk + jax.lax.broadcasted_iota(jnp.int32, (blk,), 0)
        # a clamped duplicate block must contribute nothing: the band test
        # on absolute positions already excludes it except when it IS the
        # true neighbor, so only kill it when the clamp actually fired
        dup = (i + j - 1) != kv_idx
        kmask = jnp.where(dup, 0.0, m_ref[0, :, 0].astype(jnp.float32))
        s = _band_scores(q, k_ref[0].astype(jnp.float32), scale,
                         qpos, kpos, kmask, w)
        parts.append((s, v_ref[0].astype(jnp.float32)))

    scores = jnp.concatenate([p[0] for p in parts], axis=1)   # (blk, 3blk)
    vs = jnp.concatenate([p[1] for p in parts], axis=0)       # (3blk, D)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    den = jnp.sum(e, axis=1, keepdims=True)
    p = e / den
    o_ref[0] = jnp.dot(p, vs, preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)
    lse_ref[0, :, 0] = (m[:, 0] + jnp.log(den[:, 0]))


def _dq_kernel(q_ref, k0_ref, k1_ref, k2_ref, v0_ref, v1_ref, v2_ref,
               m0_ref, m1_ref, m2_ref, lse_ref, do_ref, dr_ref, dq_ref,
               *, blk: int, w: int, nb: int, scale: float):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)                  # (blk, D)
    lse = lse_ref[0, :, 0]                              # (blk,)
    dr = dr_ref[0, :, 0]                                # (blk,) sum(dO*O)
    qpos = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk,), 0)

    dq = jnp.zeros_like(q)
    for j, (k_ref, v_ref, m_ref) in enumerate(
            ((k0_ref, v0_ref, m0_ref), (k1_ref, v1_ref, m1_ref),
             (k2_ref, v2_ref, m2_ref))):
        kv_idx = jnp.clip(i + j - 1, 0, nb - 1)
        kpos = kv_idx * blk + jax.lax.broadcasted_iota(jnp.int32, (blk,), 0)
        dup = (i + j - 1) != kv_idx
        kmask = jnp.where(dup, 0.0, m_ref[0, :, 0].astype(jnp.float32))
        k = k_ref[0].astype(jnp.float32)
        s = _band_scores(q, k, scale, qpos, kpos, kmask, w)
        p = jnp.exp(s - lse[:, None])                   # true softmax probs
        dp = jax.lax.dot_general(
            do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (blk, blk_k)
        ds = p * (dp - dr[:, None])
        dq += jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(k_ref, v_ref, m_ref, q0_ref, q1_ref, q2_ref,
                do0_ref, do1_ref, do2_ref, lse0_ref, lse1_ref, lse2_ref,
                dr0_ref, dr1_ref, dr2_ref, dk_ref, dv_ref,
                *, blk: int, w: int, nb: int, scale: float):
    i = pl.program_id(1)                                # KEY block index
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    kpos = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk,), 0)
    kmask = m_ref[0, :, 0].astype(jnp.float32)

    dk = jnp.zeros_like(k)
    dv = jnp.zeros_like(v)
    for j, (q_ref, do_ref, lse_ref, dr_ref) in enumerate(
            ((q0_ref, do0_ref, lse0_ref, dr0_ref),
             (q1_ref, do1_ref, lse1_ref, dr1_ref),
             (q2_ref, do2_ref, lse2_ref, dr2_ref))):
        q_idx = jnp.clip(i + j - 1, 0, nb - 1)
        dup = (i + j - 1) != q_idx
        q = q_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, :, 0]
        dr = dr_ref[0, :, 0]
        qpos = q_idx * blk + jax.lax.broadcasted_iota(jnp.int32, (blk,), 0)
        s = _band_scores(q, k, scale, qpos, kpos, kmask, w)
        p = jnp.exp(s - lse[:, None])                   # (blk_q, blk_k)
        # clamped duplicate q block contributes nothing
        p = jnp.where(dup, 0.0, p)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dr[:, None])
        dv += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # P^T dO
        dk += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # dS^T q
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _prep(q, k, v, mask, blk):
    b, h, s, d = q.shape
    pad = (-s) % blk
    sp = s + pad
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0))).reshape(b * h, sp, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0))).reshape(b * h, sp, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0))).reshape(b * h, sp, d)
    if mask is None:
        mask = jnp.ones((b, s), jnp.float32)
    mf = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, pad)))
    mf = jnp.repeat(mf[:, None], h, axis=1).reshape(b * h, sp)[..., None]
    return qf, kf, vf, mf, sp, pad


def _specs(blk, d, nb, *, neighbor_of):
    """BlockSpecs for (BH, S, D) tensors: own block + 3 neighbor variants."""
    def own(bh, i):
        return (bh, i, 0)

    def nb_j(j):
        def im(bh, i):
            return (bh, jax.lax.clamp(0, i + j - 1, nb - 1), 0)
        return im

    qkv = pl.BlockSpec((1, blk, d), own)
    neighbors = [pl.BlockSpec((1, blk, d), nb_j(j)) for j in range(3)]
    m_neighbors = [pl.BlockSpec((1, blk, 1), nb_j(j)) for j in range(3)]
    m_own = pl.BlockSpec((1, blk, 1), own)
    col = pl.BlockSpec((1, blk, 1), own)
    col_neighbors = [pl.BlockSpec((1, blk, 1), nb_j(j)) for j in range(3)]
    return qkv, neighbors, m_neighbors, m_own, col, col_neighbors


def pick_blocks(s: int, window: int) -> Tuple[int, int]:
    """(block_fwd_dq, block_kv) for a sequence length.

    Measured on v5e at the discrim-LM shape: 256/256 beats 512/256
    (8.84 vs 9.52 ms fwd+bwd) — larger query blocks grow the (blk, 3*blk)
    score matmuls quadratically while the useful band stays w+1 wide, so
    the halo waste dominates any per-program-latency saving.  The minimum
    block is the smallest multiple of 8 covering the one-sided window
    (neighbor radius 1)."""
    w = max(1, window // 2)
    blk = max(256, ((w + 7) // 8) * 8)
    return blk, blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def window_attention_pallas(q, k, v, mask, window: int, block: int = 256,
                            interpret: bool = False,
                            block_kv: int = 256):
    """Band softmax attention, flash-style Pallas kernels.

    q,k,v (B,H,S,D); mask (B,S) 1=keep (None = all keep); window = full
    window (one-sided = window // 2, HF convention).  Requires
    block >= window // 2 (neighbor radius 1).

    ``block`` sizes the forward and dq passes; ``block_kv`` the dk/dv pass,
    whose per-program working set is ~3x larger (three neighbor q/do/lse
    blocks) and overflows scoped VMEM at 512.  Both paddings must agree
    (they do whenever both divide S); otherwise block_kv falls back to
    block."""
    out, _ = _wa_fwd(q, k, v, mask, window, block, interpret)
    return out


def _wa_fwd(q, k, v, mask, window, block, interpret):
    b, h, s, d = q.shape
    w = max(1, window // 2)
    blk = block
    assert blk >= w, f"block {blk} must cover one-sided window {w}"
    qf, kf, vf, mf, sp, pad = _prep(q, k, v, mask, blk)
    nb = sp // blk
    scale = 1.0 / (d ** 0.5)
    qkv_spec, nbr, m_nbr, m_own, col, col_nbr = _specs(blk, d, nb,
                                                       neighbor_of=None)
    kernel = functools.partial(_fwd_kernel, blk=blk, w=w, nb=nb, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, nb),
        in_specs=[qkv_spec] + nbr + nbr + m_nbr,
        out_specs=[qkv_spec, col],
        out_shape=[jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
                   jax.ShapeDtypeStruct((b * h, sp, 1), jnp.float32)],
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
                         if (pltpu and not interpret) else None),
    )(qf, kf, kf, kf, vf, vf, vf, mf, mf, mf)
    out4 = out.reshape(b, h, sp, d)[:, :, :s]
    return out4, (q, k, v, mask, out4, lse)


def _wa_bwd(window, block, interpret, block_kv, res, g):
    q, k, v, mask, out, lse = res
    b, h, s, d = q.shape
    w = max(1, window // 2)
    blk = block
    blk_kv = block_kv if (block_kv and (-s) % block_kv == (-s) % blk
                          and block_kv >= w) else blk
    qf, kf, vf, mf, sp, pad = _prep(q, k, v, mask, blk)
    dof = jnp.pad(g, ((0, 0), (0, 0), (0, pad), (0, 0))).reshape(b * h, sp, d)
    # per-row sum(dO * O) for the softmax gradient
    dr = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    drf = jnp.pad(dr, ((0, 0), (0, 0), (0, pad))).reshape(b * h, sp, 1)
    nb = sp // blk
    scale = 1.0 / (d ** 0.5)
    qkv_spec, nbr, m_nbr, m_own, col, col_nbr = _specs(blk, d, nb,
                                                       neighbor_of=None)

    dq_kernel = functools.partial(_dq_kernel, blk=blk, w=w, nb=nb,
                                  scale=scale)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h, nb),
        in_specs=[qkv_spec] + nbr + nbr + m_nbr + [col, qkv_spec, col],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
                         if (pltpu and not interpret) else None),
    )(qf, kf, kf, kf, vf, vf, vf, mf, mf, mf, lse, dof, drf)

    nb_kv = sp // blk_kv
    kv_spec, kv_nbr, kv_m_nbr, kv_m_own, kv_col, kv_col_nbr = _specs(
        blk_kv, d, nb_kv, neighbor_of=None)
    dkv_kernel = functools.partial(_dkv_kernel, blk=blk_kv, w=w, nb=nb_kv,
                                   scale=scale)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, nb_kv),
        in_specs=[kv_spec, kv_spec, kv_m_own] + kv_nbr + kv_nbr
                 + kv_col_nbr + kv_col_nbr,
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct((b * h, sp, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, sp, d), v.dtype)],
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
                         if (pltpu and not interpret) else None),
    )(kf, vf, mf, qf, qf, qf, dof, dof, dof,
      lse, lse, lse, drf, drf, drf)

    dq = dq.reshape(b, h, sp, d)[:, :, :s]
    dk = dk.reshape(b, h, sp, d)[:, :, :s]
    dv = dv.reshape(b, h, sp, d)[:, :, :s]
    return dq, dk, dv, None


window_attention_pallas.defvjp(
    lambda q, k, v, mask, window, block, interpret, block_kv:
        _wa_fwd(q, k, v, mask, window, block, interpret),
    _wa_bwd)
