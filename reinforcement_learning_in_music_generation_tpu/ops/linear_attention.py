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
    env = os.environ.get("RLMG_ATTN_BACKEND")
    if env:
        return env
    return "pallas" if jax.default_backend() not in ("cpu",) else "xla"


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

    init = (jnp.zeros((b, h, e, f), q.dtype), jnp.zeros((b, h, e), q.dtype))
    _, (out, den) = jax.lax.scan(step, init, (qc, kc, vc))
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

    init = (jnp.zeros((b, h, e, f), q.dtype), jnp.zeros((b, h, e), q.dtype))
    _, dqc = jax.lax.scan(step_fwd, init, (qc, kc, vc, dnc, ddc))

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

    _, (dkc, dvc) = jax.lax.scan(step_rev, init, (qc, kc, vc, dnc, ddc), reverse=True)

    def unchunk(x):
        return x.transpose(1, 2, 0, 3, 4).reshape(b, h, nc * chunk, x.shape[-1])[:, :, :s0]

    return unchunk(dqc), unchunk(dkc), unchunk(dvc)


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, den_ref, s_acc, z_acc, *, eps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_acc[...] = jnp.zeros_like(s_acc)
        z_acc[...] = jnp.zeros_like(z_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    c = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    a = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    a = jnp.where(row >= col, a, 0.0)
    num = jnp.dot(a, v, preferred_element_type=jnp.float32)
    num += jnp.dot(q, s_acc[...], preferred_element_type=jnp.float32)
    den = jnp.sum(a, axis=-1) + jnp.dot(q, z_acc[0], preferred_element_type=jnp.float32)
    o_ref[0] = (num / (den + eps)[:, None]).astype(o_ref.dtype)
    den_ref[0] = den.astype(den_ref.dtype)
    s_acc[...] += jnp.dot(k.T, v, preferred_element_type=jnp.float32)
    z_acc[0] += jnp.sum(k, axis=0)


def _fwd_pallas(q, k, v, eps, chunk):
    b, h, s0, e = q.shape
    f = v.shape[-1]
    (qp, _), (kp, _), (vp, _) = _pad_chunk(q, chunk), _pad_chunk(k, chunk), _pad_chunk(v, chunk)
    s = qp.shape[2]
    nc = s // chunk
    qp = qp.reshape(b * h, s, e)
    kp = kp.reshape(b * h, s, e)
    vp = vp.reshape(b * h, s, f)

    blk = lambda d: pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0))
    out, den = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(b * h, nc),
        in_specs=[blk(e), blk(e), blk(f)],
        out_specs=[blk(f), pl.BlockSpec((1, chunk), lambda i, j: (i, j))],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, f), q.dtype),
            jax.ShapeDtypeStruct((b * h, s), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((e, f), jnp.float32),
            pltpu.VMEM((1, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(qp, kp, vp)
    out = out.reshape(b, h, s, f)[:, :, :s0]
    den = den.reshape(b, h, s)[:, :, :s0].astype(q.dtype)
    return out, den


def _bwd_dq_kernel(q_ref, k_ref, v_ref, dn_ref, dd_ref, dq_ref, s_acc, z_acc):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_acc[...] = jnp.zeros_like(s_acc)
        z_acc[...] = jnp.zeros_like(z_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dn = dn_ref[0].astype(jnp.float32)
    dd = dd_ref[0].astype(jnp.float32)
    c = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    bmat = jnp.dot(dn, v.T, preferred_element_type=jnp.float32)
    m = jnp.where(row >= col, bmat + dd[:, None], 0.0)
    dq = jnp.dot(m, k, preferred_element_type=jnp.float32)
    dq += jnp.dot(dn, s_acc[...].T, preferred_element_type=jnp.float32)
    dq += dd[:, None] * z_acc[0][None, :]
    dq_ref[0] = dq.astype(dq_ref.dtype)
    s_acc[...] += jnp.dot(k.T, v, preferred_element_type=jnp.float32)
    z_acc[0] += jnp.sum(k, axis=0)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, dn_ref, dd_ref, dk_ref, dv_ref, g_acc, gz_acc):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        g_acc[...] = jnp.zeros_like(g_acc)
        gz_acc[...] = jnp.zeros_like(gz_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dn = dn_ref[0].astype(jnp.float32)
    dd = dd_ref[0].astype(jnp.float32)
    c = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)   # j index
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)   # i index
    keep = col >= row                                       # i >= j
    cmat = jnp.dot(v, dn.T, preferred_element_type=jnp.float32)   # (j, i)
    n = jnp.where(keep, cmat + dd[None, :], 0.0)
    dk = jnp.dot(n, q, preferred_element_type=jnp.float32)
    dk += jnp.dot(v, g_acc[...].T, preferred_element_type=jnp.float32)
    dk += gz_acc[0][None, :]
    p = jnp.where(keep, jnp.dot(k, q.T, preferred_element_type=jnp.float32), 0.0)
    dv = jnp.dot(p, dn, preferred_element_type=jnp.float32)
    dv += jnp.dot(k, g_acc[...], preferred_element_type=jnp.float32)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    g_acc[...] += jnp.dot(q.T, dn, preferred_element_type=jnp.float32)
    gz_acc[0] += jnp.dot(dd, q, preferred_element_type=jnp.float32)


def _bwd_pallas(q, k, v, out, den, g, eps, chunk):
    b, h, s0, e = q.shape
    f = v.shape[-1]
    dnum = g / (den + eps)[..., None]
    dden = -jnp.sum(g * out, axis=-1) / (den + eps)
    (qp, _), (kp, _), (vp, _) = _pad_chunk(q, chunk), _pad_chunk(k, chunk), _pad_chunk(v, chunk)
    (dnp_, _) = _pad_chunk(dnum, chunk)
    s = qp.shape[2]
    pad = s - s0
    ddp = jnp.pad(dden, ((0, 0), (0, 0), (0, pad))) if pad else dden
    nc = s // chunk
    r3 = lambda x: x.reshape(b * h, s, x.shape[-1])
    qp, kp, vp, dnp_ = r3(qp), r3(kp), r3(vp), r3(dnp_)
    ddp = ddp.reshape(b * h, s)

    blk = lambda d: pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0))
    rblk = lambda d: pl.BlockSpec((1, chunk, d), lambda i, j: (i, nc - 1 - j, 0))
    sblk = pl.BlockSpec((1, chunk), lambda i, j: (i, j))
    rsblk = pl.BlockSpec((1, chunk), lambda i, j: (i, nc - 1 - j))
    params = pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"))

    dq = pl.pallas_call(
        _bwd_dq_kernel,
        grid=(b * h, nc),
        in_specs=[blk(e), blk(e), blk(f), blk(f), sblk],
        out_specs=blk(e),
        out_shape=jax.ShapeDtypeStruct((b * h, s, e), q.dtype),
        scratch_shapes=[pltpu.VMEM((e, f), jnp.float32), pltpu.VMEM((1, e), jnp.float32)],
        compiler_params=params,
    )(qp, kp, vp, dnp_, ddp)

    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(b * h, nc),
        in_specs=[rblk(e), rblk(e), rblk(f), rblk(f), rsblk],
        out_specs=[rblk(e), rblk(f)],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, s, e), q.dtype),
            jax.ShapeDtypeStruct((b * h, s, f), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((e, f), jnp.float32), pltpu.VMEM((1, e), jnp.float32)],
        compiler_params=params,
    )(qp, kp, vp, dnp_, ddp)

    cut = lambda x, d: x.reshape(b, h, s, d)[:, :, :s0]
    return cut(dq, e), cut(dk, e), cut(dv, f)


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
