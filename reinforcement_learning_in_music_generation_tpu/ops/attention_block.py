"""Fused qkv-projection + causal linear attention training kernel (r4).

Replaces the attention-side XLA region of the fused-tail training layer
(models/linear_transformer.py:_layer_forward): the qkv projections plus
the chunked linear-attention recurrence (ops/linear_attention.py:
_fwd_xla_bshe / _bwd_xla_bshe).  The r3 trace attributed 13.3 ms of the
50.1 ms pretrain step to this region (BENCH.md r3) — mostly HBM traffic
of the per-chunk (B, H, C, C) score matrices and the (N, 3D) qkv
intermediates, both of which this kernel keeps in VMEM.

TPU-native replacement for the training half of the reference's
`pytorch-fast-transformers` CUDA extension (`causal_product`,
dqn_policy/model.py:128-137).

Layout strategy (every op in a Mosaic-native direction — memory lesson:
around pallas kernels, pick layouts so nothing relayouts):

  * activations stay row-major (N, D) — plain reshapes at the kernel
    boundary, no head transposes (the r3 head-minor finding);
  * per-head math is HEAD-PAIR packed on the 128-lane axis (E=64 heads
    pair to exactly one lane tile; generic 2E otherwise):
      - lane slices at multiples of 2E (free),
      - per-head score/value matmuls use constant 0/1 half-lane masks
        instead of 64-lane slices (full-width MXU ops, no relayouts),
      - the (E, F) running states S_h pack block-diagonally into one
        (2E, 2E) tile per pair, so q2 @ S2 yields both heads' results in
        their own lane halves (the decode-kernel-v4 trick);
  * the qkv projection runs in-kernel ((C, D) @ (D, 3D) MXU matmul), so
    the (N, 3D) qkv tensor never round-trips HBM in the forward; the
    feature-mapped [phi(q) | phi(k) | v] IS stored as the backward
    residual (reading 50 MB beats recomputing 52 GFLOP/layer);
  * elu'(x) is recovered from phi without storing x:
    phi(x) = x+1 (x>0) else exp(x)  =>  phi'(x) = min(phi(x), 1).

Backward = two kernels with the same grid, matching the analytic
chunked backward of _bwd_xla_bshe: a forward-order pass (prefix (S, z)
carries) producing d(phi_q), and a reverse-order pass (suffix (G, gz)
carries) producing d(phi_k), dv.  The final dqkv -> (dh, dW, db)
matmuls stay in XLA (it schedules plain GEMMs well; the elementwise
phi' fold fuses into them).

Numerics: all in-kernel accumulation in f32 (matmuls
preferred_element_type=f32); att / phi-qkv residuals round to the
activation dtype on store, den stays f32 (it divides).  Parity vs the
XLA composition is gated by tests/test_attention_block.py (f32 tight,
bf16 loose).

MEASURED (on-chip step A/B, bench_pretrain protocol, B=32 x S=512 bf16):
r4 334,287 -> 340,876 tok/s (+2.0%); r5 re-runs 336,325 -> 338,779 and
336,385 -> 338,996 (+0.73%/+0.78%, run-to-run variance ~0.1%).  Small
but reproducibly positive (3/3 passes), so since r5 this kernel is the
DEFAULT inside the fused-tail training shape (rows >= 8192, tp == 1;
models/linear_transformer.py:_layer_forward); RLMG_ATTN_BACKEND=xla
opts out.  The r4 device trace explains the modest size of the win:
~75% of the step already sits inside pallas kernels and the attention
region is compute-bound, so eliminating its HBM round-trips moves
little (BENCH.md r4/r5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only hosts
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

# shared Mosaic-safe feature map + eps (one definition per semantic:
# decode_kernel_v3 hosts the in-kernel helpers, linear_attention the eps)
from .decode_kernel_v3 import _phi
from .linear_attention import DEFAULT_EPS


def _phi_prime_from_phi(p):
    """d phi / dx recovered from phi itself: min(phi, 1)."""
    return jnp.minimum(p, 1.0)


def _masks(c: int, e2: int, n_pair: int, d: int):
    """Constant masks: causal lower/upper (C, C) and half-lane selectors."""
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    lower = (row >= col).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e2), 1)
    h1 = (lane < e2 // 2).astype(jnp.float32)        # first head of a pair
    h2 = 1.0 - h1
    br = jax.lax.broadcasted_iota(jnp.int32, (e2, e2), 0)
    bc = jax.lax.broadcasted_iota(jnp.int32, (e2, e2), 1)
    bdiag = ((br < e2 // 2) == (bc < e2 // 2)).astype(jnp.float32)
    return lower, h1, h2, bdiag


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a^T @ b with a (K, M), b (K, N) -> (M, N)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a @ b^T with a (M, K), b (N, K) -> (M, N)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(h_ref, w_ref, b_ref, att_ref, pqkv_ref, den_ref, s_acc,
                z_acc, *, d: int, n_head: int, eps: float):
    j = pl.program_id(1)
    e2 = 2 * (d // n_head)
    n_pair = n_head // 2
    c = h_ref.shape[0]
    lower, mh1, mh2, bdiag = _masks(c, e2, n_pair, d)

    @pl.when(j == 0)
    def _():
        s_acc[...] = jnp.zeros_like(s_acc)
        z_acc[...] = jnp.zeros_like(z_acc)

    hb = h_ref[...].astype(jnp.float32)
    qkv = _dot(hb, w_ref[...].astype(jnp.float32))
    qkv += b_ref[...].astype(jnp.float32)
    q = _phi(qkv[:, :d])
    k = _phi(qkv[:, d:2 * d])
    v = qkv[:, 2 * d:]
    pqkv_ref[...] = jnp.concatenate([q, k, v], axis=-1).astype(pqkv_ref.dtype)

    att_cols, den_cols = [], []
    for p in range(n_pair):
        sl = slice(p * e2, (p + 1) * e2)
        q2, k2, v2 = q[:, sl], k[:, sl], v[:, sl]
        s2 = s_acc[p]                                 # (2E, 2E) block-diag
        z2 = z_acc[p, :1]                             # (1, 2E)
        a1 = _dot_nt(q2, k2 * mh1) * lower            # (C, C) head 1 scores
        a2 = _dot_nt(q2, k2 * mh2) * lower
        num = _dot(a1, v2 * mh1) + _dot(a2, v2 * mh2)
        num += _dot(q2, s2)                           # both heads at once
        den1 = (jnp.sum(a1, axis=1, keepdims=True)
                + jnp.sum(q2 * (z2 * mh1), axis=1, keepdims=True))
        den2 = (jnp.sum(a2, axis=1, keepdims=True)
                + jnp.sum(q2 * (z2 * mh2), axis=1, keepdims=True))
        den = den1 * mh1 + den2 * mh2                 # (C, 2E) per-lane den
        att_cols.append(num / (den + eps))
        den_cols.append(den)
        s_acc[p] = s2 + _dot_tn(k2, v2) * bdiag
        z_acc[p, :1] = z2 + jnp.sum(k2, axis=0, keepdims=True)
    att_ref[...] = jnp.concatenate(att_cols, axis=-1).astype(att_ref.dtype)
    den_ref[...] = jnp.concatenate(den_cols, axis=-1)


def _fwd(h, wqkv, bqkv, *, n_seq: int, n_head: int, chunk: int, eps: float,
         interpret: bool):
    n, d = h.shape
    nb = (n // n_seq) // chunk
    e2 = 2 * (d // n_head)
    n_pair = n_head // 2
    row = lambda width: pl.BlockSpec((chunk, width),
                                     lambda b, j: (b * nb + j, 0))
    rep = lambda r, w: pl.BlockSpec((r, w), lambda b, j: (0, 0))
    att, pqkv, den = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, n_head=n_head, eps=eps),
        grid=(n_seq, nb),
        in_specs=[row(d), rep(d, 3 * d), rep(1, 3 * d)],
        out_specs=[row(d), row(3 * d), row(d)],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), h.dtype),
            jax.ShapeDtypeStruct((n, 3 * d), h.dtype),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pair, e2, e2), jnp.float32),
            pltpu.VMEM((n_pair, 8, e2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20) if (pltpu and not interpret)
            else None),
    )(h, wqkv, bqkv.reshape(1, -1))
    return att, pqkv, den


# ---------------------------------------------------------------------------
# backward: forward-order pass -> d(phi_q); reverse pass -> d(phi_k), dv
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(pqkv_ref, g_ref, att_ref, den_ref, dq_ref, s_acc, z_acc,
                   *, d: int, n_head: int, eps: float):
    j = pl.program_id(1)
    e2 = 2 * (d // n_head)
    n_pair = n_head // 2
    c = g_ref.shape[0]
    lower, mh1, mh2, bdiag = _masks(c, e2, n_pair, d)

    @pl.when(j == 0)
    def _():
        s_acc[...] = jnp.zeros_like(s_acc)
        z_acc[...] = jnp.zeros_like(z_acc)

    g = g_ref[...].astype(jnp.float32)
    att = att_ref[...].astype(jnp.float32)
    den = den_ref[...]
    inv = 1.0 / (den + eps)
    dnum = g * inv                                   # (C, D)
    go = g * att * inv                               # summed per head below

    cols = []
    for p in range(n_pair):
        sl = slice(p * e2, (p + 1) * e2)
        q2 = pqkv_ref[:, sl].astype(jnp.float32)
        k2 = pqkv_ref[:, d + p * e2:d + (p + 1) * e2].astype(jnp.float32)
        v2 = pqkv_ref[:, 2 * d + p * e2:2 * d + (p + 1) * e2].astype(jnp.float32)
        dn2 = dnum[:, sl]
        # dden per head: -(sum_f g*out) / (den+eps), as half-lane scalars
        dd1 = -jnp.sum(go[:, sl] * mh1, axis=1, keepdims=True)   # (C, 1)
        dd2 = -jnp.sum(go[:, sl] * mh2, axis=1, keepdims=True)
        s2 = s_acc[p]
        z2 = z_acc[p, :1]
        # bmat_h = dnum_h @ v_h^T ; m = (bmat + dden_i) * lower
        m1 = (_dot_nt(dn2 * mh1, v2 * mh1) + dd1) * lower
        m2 = (_dot_nt(dn2 * mh2, v2 * mh2) + dd2) * lower
        dq2 = _dot(m1, k2 * mh1) + _dot(m2, k2 * mh2)
        # dnum @ S^T: S2 is block-diag so S2^T works pair-packed
        dq2 += _dot_nt(dn2, s2)
        dq2 += (dd1 * mh1 + dd2 * mh2) * z2
        cols.append(dq2)
        s_acc[p] = s2 + _dot_tn(k2, v2) * bdiag
        z_acc[p, :1] = z2 + jnp.sum(k2, axis=0, keepdims=True)
    dq_ref[...] = jnp.concatenate(cols, axis=-1)


def _bwd_dkv_kernel(pqkv_ref, g_ref, att_ref, den_ref, dk_ref, dv_ref,
                    g_acc, gz_acc, *, d: int, n_head: int, eps: float):
    j = pl.program_id(1)
    e2 = 2 * (d // n_head)
    n_pair = n_head // 2
    c = g_ref.shape[0]
    lower, mh1, mh2, bdiag = _masks(c, e2, n_pair, d)
    upper = lower.T

    @pl.when(j == 0)
    def _():
        g_acc[...] = jnp.zeros_like(g_acc)
        gz_acc[...] = jnp.zeros_like(gz_acc)

    g = g_ref[...].astype(jnp.float32)
    att = att_ref[...].astype(jnp.float32)
    den = den_ref[...]
    inv = 1.0 / (den + eps)
    dnum = g * inv
    go = g * att * inv

    kcols, vcols = [], []
    for p in range(n_pair):
        sl = slice(p * e2, (p + 1) * e2)
        q2 = pqkv_ref[:, sl].astype(jnp.float32)
        k2 = pqkv_ref[:, d + p * e2:d + (p + 1) * e2].astype(jnp.float32)
        v2 = pqkv_ref[:, 2 * d + p * e2:2 * d + (p + 1) * e2].astype(jnp.float32)
        dn2 = dnum[:, sl]
        dd1 = -jnp.sum(go[:, sl] * mh1, axis=1, keepdims=True)   # (C, 1)
        dd2 = -jnp.sum(go[:, sl] * mh2, axis=1, keepdims=True)
        g2 = g_acc[p]                                 # (2E, 2E) block-diag
        gz2 = gz_acc[p, :1]                           # (1, 2E)
        # cmat_h (j, i) = v_j . dnum_i ; n = (cmat + dden_i) * upper
        n1 = (_dot_nt(v2 * mh1, dn2 * mh1) + dd1.T) * upper
        n2 = (_dot_nt(v2 * mh2, dn2 * mh2) + dd2.T) * upper
        dk2 = _dot(n1, q2 * mh1) + _dot(n2, q2 * mh2)
        # v @ G^T + gz (suffix states; block-diag G)
        dk2 += _dot_nt(v2, g2)
        dk2 += gz2 * (mh1 + mh2)                      # broadcast row
        # p_h (j, i) = k_j . q_i  (strictly j <= i via upper)
        p1 = _dot_nt(k2 * mh1, q2 * mh1) * upper
        p2 = _dot_nt(k2 * mh2, q2 * mh2) * upper
        dv2 = _dot(p1, dn2 * mh1) + _dot(p2, dn2 * mh2)
        dv2 += _dot(k2, g2)
        kcols.append(dk2)
        vcols.append(dv2)
        g_acc[p] = g2 + _dot_tn(q2, dn2) * bdiag
        gz_acc[p, :1] = gz2 + (jnp.sum(q2 * (dd1 * mh1), axis=0, keepdims=True)
                               + jnp.sum(q2 * (dd2 * mh2), axis=0,
                                         keepdims=True))
    dk_ref[...] = jnp.concatenate(kcols, axis=-1)
    dv_ref[...] = jnp.concatenate(vcols, axis=-1)


def _bwd(pqkv, g, att, den, *, n_seq: int, n_head: int, chunk: int,
         eps: float, interpret: bool):
    n, d = g.shape
    nb = (n // n_seq) // chunk
    e2 = 2 * (d // n_head)
    n_pair = n_head // 2
    row = lambda width, f: pl.BlockSpec((chunk, width), f)
    fwd_idx = lambda b, j: (b * nb + j, 0)
    rev_idx = lambda b, j: (b * nb + (nb - 1 - j), 0)
    common = dict(
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20) if (pltpu and not interpret)
            else None),
    )
    scratch = lambda: [pltpu.VMEM((n_pair, e2, e2), jnp.float32),
                       pltpu.VMEM((n_pair, 8, e2), jnp.float32)]
    bsz = n_seq
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, d=d, n_head=n_head, eps=eps),
        grid=(bsz, nb),
        in_specs=[row(3 * d, fwd_idx), row(d, fwd_idx), row(d, fwd_idx),
                  row(d, fwd_idx)],
        out_specs=row(d, fwd_idx),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        scratch_shapes=scratch(),
        **common,
    )(pqkv, g, att, den)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, d=d, n_head=n_head, eps=eps),
        grid=(bsz, nb),
        in_specs=[row(3 * d, rev_idx), row(d, rev_idx), row(d, rev_idx),
                  row(d, rev_idx)],
        out_specs=[row(d, rev_idx), row(d, rev_idx)],
        out_shape=[jax.ShapeDtypeStruct((n, d), jnp.float32),
                   jax.ShapeDtypeStruct((n, d), jnp.float32)],
        scratch_shapes=scratch(),
        **common,
    )(pqkv, g, att, den)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def qkv_attention_block(h, wqkv, bqkv, n_seq: int, n_head: int,
                        chunk: int = 128, eps: float = DEFAULT_EPS,
                        interpret: bool = False):
    """h (N, D) row-major [N = n_seq sequences x S rows, S % chunk == 0]
    -> causal linear attention output (N, D), with the qkv projection
    (wqkv (D, 3D), bqkv (3D,)) fused into the kernel.

    Equivalent XLA composition (tests/test_attention_block.py):
        qkv = h @ wqkv + bqkv
        att = causal_linear_attention_bshe(phi-less q, k, v reshaped)
    """
    att, _, _ = _fwd_core(h, wqkv, bqkv, n_seq, n_head, chunk, eps,
                          interpret)
    return att


def _fwd_core(h, wqkv, bqkv, n_seq, n_head, chunk, eps, interpret):
    n, d = h.shape
    s = n // n_seq
    if s % chunk != 0:
        raise ValueError(f"sequence length {s} not divisible by chunk {chunk}")
    return _fwd(h, wqkv, bqkv, n_seq=n_seq, n_head=n_head, chunk=chunk,
                eps=eps, interpret=interpret)


def _qab_fwd(h, wqkv, bqkv, n_seq, n_head, chunk, eps, interpret):
    att, pqkv, den = _fwd_core(h, wqkv, bqkv, n_seq, n_head, chunk, eps,
                               interpret)
    return att, (h, wqkv, pqkv, att, den)


def _qab_bwd(n_seq, n_head, chunk, eps, interpret, res, g):
    h, wqkv, pqkv, att, den = res
    n, d = g.shape
    dq, dk, dv = _bwd(pqkv, g.astype(h.dtype), att, den, n_seq=n_seq,
                      n_head=n_head, chunk=chunk, eps=eps,
                      interpret=interpret)
    # phi'(x) = min(phi(x), 1), recovered from the stored phi values
    pq = pqkv[:, :d].astype(jnp.float32)
    pk = pqkv[:, d:2 * d].astype(jnp.float32)
    dxq = dq * _phi_prime_from_phi(pq)
    dxk = dk * _phi_prime_from_phi(pk)
    dqkv = jnp.concatenate([dxq, dxk, dv], axis=-1).astype(h.dtype)
    dh = dqkv @ wqkv.T
    dw = h.T @ dqkv
    db = jnp.sum(dqkv, axis=0)
    return dh, dw.astype(wqkv.dtype), db.astype(wqkv.dtype)


qkv_attention_block.defvjp(_qab_fwd, _qab_bwd)
