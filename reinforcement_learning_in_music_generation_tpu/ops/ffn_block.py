"""Fused training FFN block: LN2(h + drop(ffn2(drop(gelu(ffn1(h)))))).

The round-2 pretrain MFU analysis (BENCH.md) left the train step at 39% of
measured chip peak with the residual gap attributed to LN/dropout/glue
around the matmul stream that XLA does not fuse into the MXU pipeline.
This kernel fuses the entire post-attention half of a transformer layer —
ffn1 -> exact gelu -> dropout -> ffn2 -> dropout -> residual -> layernorm
— into one pallas_call (forward) and one pallas_call (backward, custom
VJP), eliminating every intermediate HBM round trip of the (N, 4D)
activations and generating the dropout masks with the on-core PRNG
instead of materialized rbg tensors (~15% of the r2 step was dropout mask
generation alone).

Replaces: the FFN tail of `_layer_forward`
(models/linear_transformer.py) — the hot loop of the reference's training
step (dqn_policy/model.py:128-137 TransformerEncoderLayer.forward).

Numerics: matmuls in f32 accumulation on the MXU (bf16 inputs), gelu
exact (erf form, matching jax.nn.gelu(approximate=False)), layernorm
eps=1e-5 (models/common.py:64).  Deterministic mode (dropout off) matches
the XLA path to matmul-rounding tolerance; stochastic mode draws its
masks from the Pallas PRNG — distribution-equal to the XLA path's rbg
draws, different stream (the same seed reproduces the same masks in
forward and backward, so gradients are exact for the masks actually
drawn; tests/test_ffn_block.py checks both against a mask-matched
reference).

Backward saves only the layer INPUT h (plus the seed): x1/gelu/masks are
recomputed in-kernel from h, so the fused path also cuts stashed
activation memory per layer from ~5 tensors to 1.
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

from .decode_kernel_v3 import _erf, _gelu_exact

LN_EPS = 1e-5


def _uniform_from_bits(bits):
    """uint32 -> uniform in [0,1) from the top 24 bits (int32 route: Mosaic
    has no uint32->f32 cast; 24 bits fit losslessly through int32)."""
    return ((bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
            * (2.0 ** -24))


def _dgelu(x):
    """d/dx gelu_exact(x) = Phi(x) + x * phi(x).

    Phi via the same A&S-7.1.26 erf polynomial as the forward
    (decode_kernel_v3._erf): Mosaic has no lowering for lax.erf."""
    import math
    phi = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))
    return cdf + x * phi


def _recompute(h, w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, tile,
               p: float, deterministic: bool):
    """Forward intermediates for one row tile (shared fwd/bwd)."""
    x1 = jax.lax.dot(h.astype(w1_ref.dtype), w1_ref[...],
                     preferred_element_type=jnp.float32) + b1_ref[...]
    g = _gelu_exact(x1)
    inv = 1.0 / (1.0 - p)
    if deterministic or p <= 0.0:
        m2 = None
        d2 = g
    else:
        pltpu.prng_seed(seed_ref[0] + tile * jnp.int32(1000003))
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(g.shape), jnp.uint32)
        m2 = (_uniform_from_bits(bits2) >= p).astype(jnp.float32) * inv
        d2 = g * m2
    x2 = jax.lax.dot(d2.astype(w2_ref.dtype), w2_ref[...],
                     preferred_element_type=jnp.float32) + b2_ref[...]
    if deterministic or p <= 0.0:
        m3 = None
        d3 = x2
    else:
        bits3 = pltpu.bitcast(pltpu.prng_random_bits(x2.shape), jnp.uint32)
        m3 = (_uniform_from_bits(bits3) >= p).astype(jnp.float32) * inv
        d3 = x2 * m3
    r = h.astype(jnp.float32) + d3
    return x1, g, m2, d2, m3, r


def _ln_stats(r):
    mu = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean((r - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    return (r - mu) * rstd, rstd


def _fwd_kernel(seed_ref, h_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ls_ref, lb_ref, out_ref, *, p: float, deterministic: bool):
    tile = pl.program_id(0)
    h = h_ref[...]
    _, _, _, _, _, r = _recompute(h, w1_ref, b1_ref, w2_ref, b2_ref,
                                  seed_ref, tile, p, deterministic)
    xhat, _ = _ln_stats(r)
    out_ref[...] = (xhat * ls_ref[...] + lb_ref[...]).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, h_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ls_ref, dout_ref,
                dh_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dls_ref,
                dlb_ref, *, p: float, deterministic: bool):
    tile = pl.program_id(0)
    h = h_ref[...]
    x1, g, m2, d2, m3, r = _recompute(h, w1_ref, b1_ref, w2_ref, b2_ref,
                                      seed_ref, tile, p, deterministic)
    xhat, rstd = _ln_stats(r)
    dout = dout_ref[...].astype(jnp.float32)

    @pl.when(tile == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    # layernorm backward (per row)
    dxhat = dout * ls_ref[...]
    dr = rstd * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dls_ref[...] += jnp.sum(dout * xhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dout, axis=0, keepdims=True)

    dx2 = dr if m3 is None else dr * m3
    db2_ref[...] += jnp.sum(dx2, axis=0, keepdims=True)
    # dW2 = d2^T @ dx2   (contract the row-tile axis)
    # f32 operands: TPU's default matmul precision rounds them to bf16 on
    # the MXU anyway (same speed), while interpret/CPU stays exact
    dw2_ref[...] += jax.lax.dot_general(
        d2, dx2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dd2 = jax.lax.dot_general(
        dx2.astype(w2_ref.dtype), w2_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dg = dd2 if m2 is None else dd2 * m2
    dx1 = dg * _dgelu(x1)
    db1_ref[...] += jnp.sum(dx1, axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(
        h.astype(jnp.float32), dx1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = dr + jax.lax.dot_general(
        dx1.astype(w1_ref.dtype), w1_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dh_ref[...] = dh.astype(dh_ref.dtype)


def _pack_rows(h, block):
    n, d = h.shape
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        h = jnp.concatenate([h, jnp.zeros((pad, d), h.dtype)], axis=0)
    return h, nb, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def ffn_block(h, w1, b1, w2, b2, ln_scale, ln_bias, seed,
              p: float, block: int = 256, interpret: bool = False):
    """h (N, D) -> LN(h + drop(W2 @ drop(gelu(W1 @ h)))), fused.

    `seed`: int32 scalar (may be traced; same seed => same dropout masks,
    the VJP relies on this).  `p`/`block`/`interpret` are static."""
    out, _ = _ffn_fwd(h, w1, b1, w2, b2, ln_scale, ln_bias, seed,
                      p, block, interpret)
    return out


def _ffn_fwd(h, w1, b1, w2, b2, ln_scale, ln_bias, seed, p, block, interpret):
    n, d = h.shape
    di = w1.shape[1]
    deterministic = (p is None) or (p <= 0.0)
    hp, nb, pad = _pack_rows(h, block)
    row = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, p=float(p or 0.0),
                          deterministic=deterministic),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # h tile
            row(d, di), row(1, di), row(di, d), row(1, d),    # w1 b1 w2 b2
            row(1, d), row(1, d),                             # ln scale/bias
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * block, d), h.dtype),
        compiler_params=(None if interpret else
                         pltpu.CompilerParams(vmem_limit_bytes=100 << 20)),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1,), hp, w1,
      b1.reshape(1, di), w2, b2.reshape(1, d),
      ln_scale.reshape(1, d), ln_bias.reshape(1, d))
    out = out[:n]
    return out, (h, w1, b1, w2, b2, ln_scale, seed)


def _ffn_bwd(p, block, interpret, res, dout):
    h, w1, b1, w2, b2, ln_scale, seed = res
    n, d = h.shape
    di = w1.shape[1]
    deterministic = (p is None) or (p <= 0.0)
    hp, nb, pad = _pack_rows(h, block)
    doutp, _, _ = _pack_rows(dout.astype(h.dtype), block)
    row = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    dh, dw1, db1, dw2, db2, dls, dlb = pl.pallas_call(
        functools.partial(_bwd_kernel, p=float(p or 0.0),
                          deterministic=deterministic),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # h tile
            row(d, di), row(1, di), row(di, d), row(1, d),
            row(1, d),                                        # ln scale
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # dout tile
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # dh
            row(d, di), row(1, di), row(di, d), row(1, d),    # dw1..db2
            row(1, d), row(1, d),                             # dls dlb
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * block, d), h.dtype),
            jax.ShapeDtypeStruct((d, di), jnp.float32),
            jax.ShapeDtypeStruct((1, di), jnp.float32),
            jax.ShapeDtypeStruct((di, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=(None if interpret else
                         pltpu.CompilerParams(vmem_limit_bytes=100 << 20)),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1,), hp, w1,
      b1.reshape(1, di), w2, b2.reshape(1, d), ln_scale.reshape(1, d),
      doutp)
    import numpy as onp
    dseed = onp.zeros(onp.shape(seed), jax.dtypes.float0)
    return (dh[:n], dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            dls[0].astype(ln_scale.dtype), dlb[0].astype(ln_scale.dtype),
            dseed)


ffn_block.defvjp(_ffn_fwd, _ffn_bwd)
