"""Causal linear attention — the framework's core compute kernel.

TPU-native replacement for the reference's `pytorch-fast-transformers`
CUDA extension (`causal_product`), which powers
`attention_type="causal-linear"` in dqn_policy/model.py:128-150.

Math (Katharopoulos et al. 2020, as implemented by fast_transformers):

    phi(x)  = elu(x) + 1
    S_i     = sum_{j<=i} phi(k_j) v_j^T          (E x F running state)
    z_i     = sum_{j<=i} phi(k_j)                (E running state)
    out_i   = (phi(q_i)^T S_i) / (phi(q_i) . z_i + eps)

Two implementations with identical numerics:

  * ``backend="xla"``   — chunked `lax.scan`; runs anywhere (CPU tests).
  * ``backend="pallas"`` — fused Pallas TPU kernels (forward + both backward
    passes), chunk-parallel intra-chunk matmuls on the MXU with an (S, z)
    carry in VMEM scratch across sequential grid steps.

Both are wrapped in one `jax.custom_vjp` so training uses the analytic
backward (forward-carry pass for dq, reverse-carry pass for dk/dv) instead
of differentiating through the scan.

A single-token recurrent step (`linear_attention_step`) provides the O(1)
decode mode of the reference's `RecurrentEncoderBuilder`
(dqn_policy/model.py:141-150, 236-238).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only hosts
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

DEFAULT_EPS = 1e-6
_DEF_CHUNK = 128


def default_backend() -> str:
    """Training-path default.

    Measured on the tunneled v5e (BENCH.md round-2 MFU sweep): the XLA
    chunked path beats the Pallas kernels at the reference training shapes
    (B=64/S=512: 147K vs 126K tok/s full train step) and, more importantly,
    the Pallas fwd+bwd at B>=64 crashes this platform's remote compile
    helper (HTTP 500).  The Pallas kernels remain selectable
    (RLMG_ATTN_BACKEND=pallas / cfg.attn_backend), parity-tested, and used
    by the sequence-parallel path; the fused *decode* kernel
    (ops/decode_kernel_v3) is unaffected and is the decode default on TPU.
    """
    env = os.environ.get("RLMG_ATTN_BACKEND")
    if env:
        return env
    return "xla"


def feature_map(x: jax.Array) -> jax.Array:
    """elu(x) + 1, the fast_transformers causal-linear feature map."""
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


# ---------------------------------------------------------------------------
# XLA chunked implementation
# ---------------------------------------------------------------------------

def _pad_chunk(x: jax.Array, chunk: int) -> Tuple[jax.Array, int]:
    s = x.shape[2]
    pad = (-s) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x, s


def _causal_mask(c: int, dtype=jnp.float32) -> jax.Array:
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (row >= col).astype(dtype)


def _fwd_xla(q, k, v, eps, chunk):
    """Returns (out, den). q/k already feature-mapped. (B,H,S,E),(B,H,S,F)."""
    b, h, s0, e = q.shape
    f = v.shape[-1]
    (q, _), (k, _), (v, _) = _pad_chunk(q, chunk), _pad_chunk(k, chunk), _pad_chunk(v, chunk)
    nc = q.shape[2] // chunk
    qc = q.reshape(b, h, nc, chunk, e).transpose(2, 0, 1, 3, 4)
    kc = k.reshape(b, h, nc, chunk, e).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(b, h, nc, chunk, f).transpose(2, 0, 1, 3, 4)
    mask = _causal_mask(chunk, q.dtype)

    def step(carry, inp):
        s_c, z_c = carry
        qb, kb, vb = inp
        a = jnp.einsum("bhie,bhje->bhij", qb, kb) * mask
        num = jnp.einsum("bhij,bhjf->bhif", a, vb) + jnp.einsum("bhie,bhef->bhif", qb, s_c)
        den = jnp.sum(a, axis=-1) + jnp.einsum("bhie,bhe->bhi", qb, z_c)
        out = num / (den + eps)[..., None]
        s_c = s_c + jnp.einsum("bhje,bhjf->bhef", kb, vb)
        z_c = z_c + jnp.sum(kb, axis=2)
        return (s_c, z_c), (out, den)

    # derive the zero carry from the inputs so shard_map's varying-axis
    # types match (plain jnp.zeros is 'unvarying' and scan rejects the mix)
    init = (jnp.einsum("bhje,bhjf->bhef", k[:, :, :1], v[:, :, :1]) * 0.0,
            jnp.sum(k[:, :, :1], axis=2) * 0.0)
    # unrolled chunk loop: removes the scan's DUS stacking and lets XLA
    # turn the chunk-major gathers into static slices (same trick as the
    # layer-scan unroll, BENCH.md round 2)
    _, (out, den) = jax.lax.scan(step, init, (qc, kc, vc),
                                 unroll=min(nc, 8))
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, nc * chunk, f)[:, :, :s0]
    den = den.transpose(1, 2, 0, 3).reshape(b, h, nc * chunk)[:, :, :s0]
    return out, den


def _bwd_xla(q, k, v, out, den, g, eps, chunk):
    """Analytic backward. Returns (dq, dk, dv) w.r.t. feature-mapped q/k."""
    b, h, s0, e = q.shape
    f = v.shape[-1]
    dnum = g / (den + eps)[..., None]                       # (B,H,S,F)
    dden = -jnp.sum(g * out, axis=-1) / (den + eps)         # (B,H,S)

    (q, _), (k, _), (v, _) = _pad_chunk(q, chunk), _pad_chunk(k, chunk), _pad_chunk(v, chunk)
    pad = q.shape[2] - s0
    if pad:
        dnum = jnp.pad(dnum, ((0, 0), (0, 0), (0, pad), (0, 0)))
        dden = jnp.pad(dden, ((0, 0), (0, 0), (0, pad)))
    nc = q.shape[2] // chunk

    def chunked(x):
        return x.reshape(b, h, nc, chunk, *x.shape[3:]).transpose(2, 0, 1, 3, *range(4, x.ndim + 1))

    qc, kc, vc = chunked(q), chunked(k), chunked(v)
    dnc, ddc = chunked(dnum), chunked(dden)
    lower = _causal_mask(chunk, q.dtype)         # i >= j
    upper = lower.T                              # used as [j,i] masks

    # forward pass: dq needs inclusive-prefix S, z of *previous* chunks
    def step_fwd(carry, inp):
        s_c, z_c = carry
        qb, kb, vb, dnb, ddb = inp
        bmat = jnp.einsum("bhif,bhjf->bhij", dnb, vb)       # dnum_i . v_j
        m = (bmat + ddb[..., None]) * lower
        dq = jnp.einsum("bhij,bhje->bhie", m, kb)
        dq += jnp.einsum("bhif,bhef->bhie", dnb, s_c)
        dq += ddb[..., None] * z_c[:, :, None, :]
        s_c = s_c + jnp.einsum("bhje,bhjf->bhef", kb, vb)
        z_c = z_c + jnp.sum(kb, axis=2)
        return (s_c, z_c), dq

    init = (jnp.einsum("bhje,bhjf->bhef", k[:, :, :1], v[:, :, :1]) * 0.0,
            jnp.sum(k[:, :, :1], axis=2) * 0.0)
    _, dqc = jax.lax.scan(step_fwd, init, (qc, kc, vc, dnc, ddc),
                          unroll=min(nc, 8))

    # reverse pass: dk/dv need suffix sums G = sum_{i>=j} q_i (x) dnum_i, gz
    def step_rev(carry, inp):
        g_c, gz_c = carry
        qb, kb, vb, dnb, ddb = inp
        cmat = jnp.einsum("bhjf,bhif->bhji", vb, dnb)       # C[j,i] = v_j . dnum_i
        n = (cmat + ddb[:, :, None, :]) * upper
        dk = jnp.einsum("bhji,bhie->bhje", n, qb)
        dk += jnp.einsum("bhjf,bhef->bhje", vb, g_c)        # G_c v_j
        dk += gz_c[:, :, None, :]
        p = jnp.einsum("bhje,bhie->bhji", kb, qb) * upper   # k_j . q_i, i >= j
        dv = jnp.einsum("bhji,bhif->bhjf", p, dnb)
        dv += jnp.einsum("bhje,bhef->bhjf", kb, g_c)
        g_c = g_c + jnp.einsum("bhie,bhif->bhef", qb, dnb)
        gz_c = gz_c + jnp.einsum("bhi,bhie->bhe", ddb, qb)
        return (g_c, gz_c), (dk, dv)

    _, (dkc, dvc) = jax.lax.scan(step_rev, init, (qc, kc, vc, dnc, ddc),
                                 reverse=True, unroll=min(nc, 8))

    def unchunk(x):
        return x.transpose(1, 2, 0, 3, 4).reshape(b, h, nc * chunk, x.shape[-1])[:, :, :s0]

    return unchunk(dqc), unchunk(dkc), unchunk(dvc)


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------

# The kernels use an augmented-column formulation: v is extended with a ones
# column so the denominator (and its gradient carry) ride along as the last
# column of the same matmuls — S_aug = [S | z], num_aug = [num | den].  This
# keeps every pallas block 3D with full trailing dims (Mosaic tiling rule).

def _fwd_kernel(q_ref, k_ref, va_ref, o_ref, s_acc):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_acc[...] = jnp.zeros_like(s_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    va = va_ref[0].astype(jnp.float32)          # (C, F+1), last col = 1
    c = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    a = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    a = jnp.where(row >= col, a, 0.0)
    num = jnp.dot(a, va, preferred_element_type=jnp.float32)
    num += jnp.dot(q, s_acc[...], preferred_element_type=jnp.float32)
    o_ref[0] = num.astype(o_ref.dtype)          # [:, :F]=num, [:, F]=den
    s_acc[...] += jnp.dot(k.T, va, preferred_element_type=jnp.float32)


def _aug_ones(v):
    return jnp.concatenate([v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1)


def _fwd_pallas(q, k, v, eps, chunk):
    b, h, s0, e = q.shape
    f = v.shape[-1]
    (qp, _), (kp, _), (vp, _) = _pad_chunk(q, chunk), _pad_chunk(k, chunk), _pad_chunk(v, chunk)
    s = qp.shape[2]
    nc = s // chunk
    qp = qp.reshape(b * h, s, e)
    kp = kp.reshape(b * h, s, e)
    vap = _aug_ones(vp.reshape(b * h, s, f))

    blk = lambda d: pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0))
    numden = pl.pallas_call(
        _fwd_kernel,
        grid=(b * h, nc),
        in_specs=[blk(e), blk(e), blk(f + 1)],
        out_specs=blk(f + 1),
        out_shape=jax.ShapeDtypeStruct((b * h, s, f + 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((e, f + 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(qp, kp, vap)
    numden = numden.reshape(b, h, s, f + 1)[:, :, :s0]
    den = numden[..., f]
    out = (numden[..., :f] / (den + eps)[..., None]).astype(q.dtype)
    return out, den.astype(q.dtype)


def _bwd_dq_kernel(k_ref, va_ref, dna_ref, dq_ref, s_acc):
    """Forward-order pass: dq_i = sum_{j<=i} (dn_aug_i . va_j) k_j
    + dn_aug_i @ S_aug^T, with dn_aug = [dnum | dden]."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_acc[...] = jnp.zeros_like(s_acc)

    k = k_ref[0].astype(jnp.float32)
    va = va_ref[0].astype(jnp.float32)
    dna = dna_ref[0].astype(jnp.float32)
    c = k.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    m = jnp.dot(dna, va.T, preferred_element_type=jnp.float32)
    m = jnp.where(row >= col, m, 0.0)
    dq = jnp.dot(m, k, preferred_element_type=jnp.float32)
    dq += jnp.dot(dna, s_acc[...].T, preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    s_acc[...] += jnp.dot(k.T, va, preferred_element_type=jnp.float32)


def _bwd_dkv_kernel(q_ref, k_ref, va_ref, dna_ref, dk_ref, dv_ref, g_acc):
    """Reverse-order pass carrying G_aug = sum_{later} q_i (x) dn_aug_i:
    dk_j = sum_{i>=j} (va_j . dn_aug_i) q_i + va_j @ G_aug^T,
    dv_j = sum_{i>=j} (k_j . q_i) dnum_i + k_j @ G_aug (first F cols)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        g_acc[...] = jnp.zeros_like(g_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    va = va_ref[0].astype(jnp.float32)
    dna = dna_ref[0].astype(jnp.float32)
    c = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)   # j index
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)   # i index
    keep = col >= row                                       # i >= j
    n = jnp.dot(va, dna.T, preferred_element_type=jnp.float32)   # (j, i)
    n = jnp.where(keep, n, 0.0)
    dk = jnp.dot(n, q, preferred_element_type=jnp.float32)
    dk += jnp.dot(va, g_acc[...].T, preferred_element_type=jnp.float32)
    p = jnp.where(keep, jnp.dot(k, q.T, preferred_element_type=jnp.float32), 0.0)
    dv = jnp.dot(p, dna, preferred_element_type=jnp.float32)
    dv += jnp.dot(k, g_acc[...], preferred_element_type=jnp.float32)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)      # last col is dden-junk; cut outside
    g_acc[...] += jnp.dot(q.T, dna, preferred_element_type=jnp.float32)


def _bwd_pallas(q, k, v, out, den, g, eps, chunk):
    b, h, s0, e = q.shape
    f = v.shape[-1]
    dnum = g / (den + eps)[..., None]
    dden = -jnp.sum(g * out, axis=-1) / (den + eps)
    dna = jnp.concatenate([dnum, dden[..., None]], axis=-1)      # (B,H,S,F+1)
    (qp, _), (kp, _), (vp, _) = _pad_chunk(q, chunk), _pad_chunk(k, chunk), _pad_chunk(v, chunk)
    (dnap, _) = _pad_chunk(dna, chunk)
    s = qp.shape[2]
    nc = s // chunk
    r3 = lambda x: x.reshape(b * h, s, x.shape[-1])
    qp, kp, dnap = r3(qp), r3(kp), r3(dnap)
    vap = _aug_ones(r3(vp))

    blk = lambda d: pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0))
    rblk = lambda d: pl.BlockSpec((1, chunk, d), lambda i, j: (i, nc - 1 - j, 0))
    params = pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"))

    dq = pl.pallas_call(
        _bwd_dq_kernel,
        grid=(b * h, nc),
        in_specs=[blk(e), blk(f + 1), blk(f + 1)],
        out_specs=blk(e),
        out_shape=jax.ShapeDtypeStruct((b * h, s, e), q.dtype),
        scratch_shapes=[pltpu.VMEM((e, f + 1), jnp.float32)],
        compiler_params=params,
    )(kp, vap, dnap)

    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(b * h, nc),
        in_specs=[rblk(e), rblk(e), rblk(f + 1), rblk(f + 1)],
        out_specs=[rblk(e), rblk(f + 1)],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, e), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, f + 1), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((e, f + 1), jnp.float32)],
        compiler_params=params,
    )(qp, kp, vap, dnap)

    cut = lambda x, d: x.reshape(b, h, s, d)[:, :, :s0]
    return cut(dq, e), cut(dk, e), cut(dv, f + 1)[..., :f]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _core(phi_q, phi_k, v, eps, chunk, backend):
    out, _ = (_fwd_pallas if backend == "pallas" else _fwd_xla)(phi_q, phi_k, v, eps, chunk)
    return out


def _core_fwd(phi_q, phi_k, v, eps, chunk, backend):
    out, den = (_fwd_pallas if backend == "pallas" else _fwd_xla)(phi_q, phi_k, v, eps, chunk)
    return out, (phi_q, phi_k, v, out, den)


def _core_bwd(eps, chunk, backend, res, g):
    phi_q, phi_k, v, out, den = res
    fn = _bwd_pallas if backend == "pallas" else _bwd_xla
    return fn(phi_q, phi_k, v, out, den, g, eps, chunk)


_core.defvjp(_core_fwd, _core_bwd)


def causal_linear_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    eps: float = DEFAULT_EPS,
    chunk: int = _DEF_CHUNK,
    backend: str | None = None,
) -> jax.Array:
    """Causal linear attention over (B, H, S, E) -> (B, H, S, F).

    Applies the elu+1 feature map to q/k internally (differentiable),
    then the custom-VJP core.
    """
    backend = backend or default_backend()
    if backend == "pallas" and pltpu is None:
        backend = "xla"
    return _core(feature_map(q), feature_map(k), v, eps, chunk, backend)


# ---------------------------------------------------------------------------
# Sequence-parallel mode (shard_map over a mesh axis)
# ---------------------------------------------------------------------------

def causal_linear_attention_sp(q: jax.Array, k: jax.Array, v: jax.Array,
                               axis_name: str, *, eps: float = DEFAULT_EPS,
                               chunk: int = _DEF_CHUNK,
                               backend: str | None = None) -> jax.Array:
    """Sequence-parallel causal linear attention for use inside `shard_map`.

    The sequence axis is sharded over `axis_name`.  Because the linear-
    attention state is an associative running sum (S, z), cross-shard
    causality reduces to an exclusive prefix of per-shard state totals:

        out_i = (num_local_i + phi(q_i)^T S_prev) / (den_local_i + phi(q_i).z_prev)

    One all_gather of (S_tot, z_tot) per call ((H, E, F) + (H, E) per shard
    — tiny vs activations) rides the ICI; everything else is local, so the
    compute kernel is unchanged.  Differentiable: the correction is plain
    jnp and the collective transposes under AD.

    The reference has no distributed code at all (SURVEY §2.5); this is the
    'SP as a stretch feature' the survey sketches for long sequences.
    """
    backend = backend or default_backend()
    if backend == "pallas" and pltpu is None:
        backend = "xla"
    pq, pk = feature_map(q), feature_map(k)
    out_local, den_local = _core_with_den(pq, pk, v, eps, chunk, backend)

    s_tot = jnp.einsum("bhse,bhsf->bhef", pk, v)
    z_tot = jnp.sum(pk, axis=2)
    s_all = jax.lax.all_gather(s_tot, axis_name)       # (n_sp, B, H, E, F)
    z_all = jax.lax.all_gather(z_tot, axis_name)
    n_sp = s_all.shape[0]
    idx = jax.lax.axis_index(axis_name)
    w = (jnp.arange(n_sp) < idx).astype(q.dtype)
    s_prev = jnp.einsum("n,nbhef->bhef", w, s_all)
    z_prev = jnp.einsum("n,nbhe->bhe", w, z_all)

    num = out_local * (den_local + eps)[..., None]
    num = num + jnp.einsum("bhse,bhef->bhsf", pq, s_prev)
    den = den_local + jnp.einsum("bhse,bhe->bhs", pq, z_prev)
    return num / (den + eps)[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _core_with_den(phi_q, phi_k, v, eps, chunk, backend):
    return (_fwd_pallas if backend == "pallas" else _fwd_xla)(
        phi_q, phi_k, v, eps, chunk)


def _core_with_den_fwd(phi_q, phi_k, v, eps, chunk, backend):
    out, den = (_fwd_pallas if backend == "pallas" else _fwd_xla)(
        phi_q, phi_k, v, eps, chunk)
    return (out, den), (phi_q, phi_k, v, out, den)


def _core_with_den_bwd(eps, chunk, backend, res, cotangents):
    g, g_den = cotangents
    phi_q, phi_k, v, out, den = res
    fn = _bwd_pallas if backend == "pallas" else _bwd_xla
    dq, dk, dv = fn(phi_q, phi_k, v, out, den, g, eps, chunk)
    # cotangent through den (used by the SP correction):
    # den_i = phi_q_i . cumsum(phi_k)_i
    ck = jnp.cumsum(phi_k, axis=2)
    dq = dq + g_den[..., None] * ck
    # reverse-cumulative for k: dk_j += sum_{i>=j} g_den_i phi_q_i
    rev = jnp.cumsum((g_den[..., None] * phi_q)[:, :, ::-1], axis=2)[:, :, ::-1]
    dk = dk + rev
    return dq, dk, dv


_core_with_den.defvjp(_core_with_den_fwd, _core_with_den_bwd)


# ---------------------------------------------------------------------------
# Recurrent single-token decode step
# ---------------------------------------------------------------------------

def init_attention_state(batch: int, n_head: int, d_head: int, d_value: int | None = None,
                         dtype=jnp.float32):
    """Zero (S, z) state for one layer: mirrors fast_transformers recurrent
    `memory` (dqn_policy/model.py:236-238)."""
    d_value = d_value or d_head
    return (
        jnp.zeros((batch, n_head, d_head, d_value), dtype),
        jnp.zeros((batch, n_head, d_head), dtype),
    )


def linear_attention_step(q, k, v, state, *, eps: float = DEFAULT_EPS):
    """One-token update. q/k/v: (B, H, E) raw (feature map applied here).

    Returns (out (B,H,F), new_state). State update S += phi(k) v^T happens
    before the read, so position i attends to j <= i (self included),
    matching the parallel mode exactly.
    """
    s_c, z_c = state
    pq, pk = feature_map(q), feature_map(k)
    s_c = s_c + pk[..., :, None] * v[..., None, :]
    z_c = z_c + pk
    num = jnp.einsum("bhe,bhef->bhf", pq, s_c)
    den = jnp.einsum("bhe,bhe->bh", pq, z_c) + eps
    return num / den[..., None], (s_c, z_c)


# ---------------------------------------------------------------------------
# (B, S, H, E)-native layout variant — zero head transposes
# ---------------------------------------------------------------------------
#
# The standard path works in (B, H, S, E), which forces a materialized
# (B,S,H,E)<->(B,H,S,E) layout copy on each side of every layer once the
# post-attention tail is an opaque pallas_call (attn_tail_block pins its
# operand layouts, so XLA can no longer fuse the _split/_merge_heads
# transposes into neighbors; r3 trace: 96 copies x ~108us = ~10ms of a
# 58ms step).  This variant keeps the head axis where the projections
# naturally produce it — q/k/v are plain reshapes of the (N, D) matmul
# outputs — and runs the identical chunked recurrence with einsums
# written for (b, i, h, e).  Chunks are sliced in a static python loop
# (free views; the r2 scan-unroll finding) and re-joined with a
# contiguous concatenate instead of transposes.  Numerics are identical
# to _fwd_xla/_bwd_xla modulo summation order (same einsum contractions,
# same mask, same carries).

def _fwd_xla_bshe(q, k, v, eps, chunk):
    """(B, S, H, E) x (B, S, H, F) -> out (B, S, H, F), den (B, S, H)."""
    b, s0, h, e = q.shape
    f = v.shape[-1]
    pad = (-s0) % chunk
    if pad:
        p4 = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, p4), jnp.pad(k, p4), jnp.pad(v, p4)
    nc = q.shape[1] // chunk
    mask = _causal_mask(chunk, q.dtype)
    s_c = jnp.einsum("bjhe,bjhf->bhef", k[:, :1], v[:, :1]) * 0.0
    z_c = jnp.einsum("bjhe->bhe", k[:, :1]) * 0.0
    outs, dens = [], []
    for j in range(nc):
        sl = slice(j * chunk, (j + 1) * chunk)
        qb, kb, vb = q[:, sl], k[:, sl], v[:, sl]
        a = jnp.einsum("bihe,bjhe->bhij", qb, kb) * mask
        num = (jnp.einsum("bhij,bjhf->bihf", a, vb)
               + jnp.einsum("bihe,bhef->bihf", qb, s_c))
        den = (jnp.einsum("bhij->bih", a)
               + jnp.einsum("bihe,bhe->bih", qb, z_c))
        outs.append(num / (den + eps)[..., None])
        dens.append(den)
        s_c = s_c + jnp.einsum("bjhe,bjhf->bhef", kb, vb)
        z_c = z_c + jnp.einsum("bjhe->bhe", kb)
    out = jnp.concatenate(outs, axis=1)[:, :s0]
    den = jnp.concatenate(dens, axis=1)[:, :s0]
    return out, den


def _bwd_xla_bshe(q, k, v, out, den, g, eps, chunk):
    """Analytic backward in (B, S, H, *) layout; returns (dq, dk, dv)."""
    b, s0, h, e = q.shape
    f = v.shape[-1]
    dnum = g / (den + eps)[..., None]                       # (B,S,H,F)
    dden = -jnp.sum(g * out, axis=-1) / (den + eps)         # (B,S,H)
    pad = (-s0) % chunk
    if pad:
        p4 = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, p4), jnp.pad(k, p4), jnp.pad(v, p4)
        dnum = jnp.pad(dnum, p4)
        dden = jnp.pad(dden, ((0, 0), (0, pad), (0, 0)))
    nc = q.shape[1] // chunk
    lower = _causal_mask(chunk, q.dtype)                    # i >= j
    upper = lower.T

    def blk(x, j):
        return x[:, j * chunk:(j + 1) * chunk]

    # forward pass: dq needs prefix S/z of previous chunks
    s_c = jnp.einsum("bjhe,bjhf->bhef", k[:, :1], v[:, :1]) * 0.0
    z_c = jnp.einsum("bjhe->bhe", k[:, :1]) * 0.0
    dqs = []
    for j in range(nc):
        qb, kb, vb = blk(q, j), blk(k, j), blk(v, j)
        dnb, ddb = blk(dnum, j), blk(dden, j)
        bmat = jnp.einsum("bihf,bjhf->bhij", dnb, vb)
        m = (bmat + jnp.einsum("bih->bhi", ddb)[..., None]) * lower
        dq = jnp.einsum("bhij,bjhe->bihe", m, kb)
        dq += jnp.einsum("bihf,bhef->bihe", dnb, s_c)
        dq += ddb[..., None] * z_c[:, None]
        dqs.append(dq)
        s_c = s_c + jnp.einsum("bjhe,bjhf->bhef", kb, vb)
        z_c = z_c + jnp.einsum("bjhe->bhe", kb)

    # reverse pass: dk/dv need suffix sums G, gz
    g_c = jnp.einsum("bjhe,bjhf->bhef", k[:, :1], v[:, :1]) * 0.0
    gz_c = jnp.einsum("bjhe->bhe", k[:, :1]) * 0.0
    dks, dvs = [], []
    for j in reversed(range(nc)):
        qb, kb, vb = blk(q, j), blk(k, j), blk(v, j)
        dnb, ddb = blk(dnum, j), blk(dden, j)
        cmat = jnp.einsum("bjhf,bihf->bhji", vb, dnb)
        n = (cmat + jnp.einsum("bih->bhi", ddb)[:, :, None]) * upper
        dk = jnp.einsum("bhji,bihe->bjhe", n, qb)
        dk += jnp.einsum("bjhf,bhef->bjhe", vb, g_c)
        dk += gz_c[:, None]
        p = jnp.einsum("bjhe,bihe->bhji", kb, qb) * upper
        dv = jnp.einsum("bhji,bihf->bjhf", p, dnb)
        dv += jnp.einsum("bjhe,bhef->bjhf", kb, g_c)
        dks.append(dk)
        dvs.append(dv)
        g_c = g_c + jnp.einsum("bihe,bihf->bhef", qb, dnb)
        gz_c = gz_c + jnp.einsum("bih,bihe->bhe", ddb, qb)

    dq = jnp.concatenate(dqs, axis=1)[:, :s0]
    dk = jnp.concatenate(list(reversed(dks)), axis=1)[:, :s0]
    dv = jnp.concatenate(list(reversed(dvs)), axis=1)[:, :s0]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _core_bshe(phi_q, phi_k, v, eps, chunk):
    out, _ = _fwd_xla_bshe(phi_q, phi_k, v, eps, chunk)
    return out


def _core_bshe_fwd(phi_q, phi_k, v, eps, chunk):
    out, den = _fwd_xla_bshe(phi_q, phi_k, v, eps, chunk)
    return out, (phi_q, phi_k, v, out, den)


def _core_bshe_bwd(eps, chunk, res, g):
    phi_q, phi_k, v, out, den = res
    return _bwd_xla_bshe(phi_q, phi_k, v, out, den, g, eps, chunk)


_core_bshe.defvjp(_core_bshe_fwd, _core_bshe_bwd)


def causal_linear_attention_bshe(q: jax.Array, k: jax.Array, v: jax.Array,
                                 *, eps: float = DEFAULT_EPS,
                                 chunk: int = _DEF_CHUNK) -> jax.Array:
    """Causal linear attention over (B, S, H, E) -> (B, S, H, F).

    Same math as causal_linear_attention (elu+1 feature map + custom-VJP
    chunked recurrence) in the head-minor layout, so callers that keep
    activations (N, D)-shaped (the fused-tail training path) never
    transpose the head axis."""
    return _core_bshe(feature_map(q), feature_map(k), v, eps, chunk)
