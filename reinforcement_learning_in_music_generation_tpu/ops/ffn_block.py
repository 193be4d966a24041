"""Fused training-layer tail kernels (the single-chip TPU training path).

Two generations, both one pallas_call forward + one backward (custom
VJP), dropout masks from the on-core PRNG (~15% of the r2 step was rbg
mask generation alone):

  * ``ffn_block``      — LN2(h + drop(ffn2(drop(gelu(ffn1(h)))))), the
    post-LN1 half of a layer (+14.5% train step vs xla, BENCH.md r3).
  * ``attn_tail_block`` — everything after the attention contraction:
    Wo + attention-dropout + residual + LN1 + the whole FFN tail.  With
    the head-minor attention layouts (ops/linear_attention.py
    `causal_linear_attention_bshe`, ops/window_attention.py
    `window_attention_bshe`) there are ZERO materialized transposes in
    the layer, and the 12L pretrain step runs 327.3K tok/s — +43% over
    the all-XLA step, 56% of the measured chip ceiling (BENCH.md r3).
    Default on single-device TPU for >=RLMG_FFN_MIN_ROWS rows
    (models/linear_transformer.py:_ffn_backend); also adopted by the
    Longformer trunk with ``mid_drop=False`` (models/longformer.py).

The round-2 pretrain MFU analysis (BENCH.md) left the train step at 39%
of measured chip peak with the residual gap attributed to LN/dropout/
glue around the matmul stream that XLA does not fuse into the MXU
pipeline; these kernels eliminate every intermediate HBM round trip of
the (N, 4D) activations.

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
    return out, (h, w1, b1, w2, b2, ln_scale, ln_bias, seed)


def _ffn_bwd(p, block, interpret, res, dout):
    h, w1, b1, w2, b2, ln_scale, ln_bias, seed = res
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
            dls[0].astype(ln_scale.dtype), dlb[0].astype(ln_bias.dtype),
            dseed)


ffn_block.defvjp(_ffn_fwd, _ffn_bwd)


# ---------------------------------------------------------------------------
# attn_tail_block: the ENTIRE post-attention half of a layer in one kernel.
#
#   out = LN2(h1 + drop3(W2 @ drop2(gelu(W1 @ h1))))
#   h1  = LN1(h_in + drop1(Wo @ a_pre + bo))
#
# vs ffn_block this additionally fuses the attention output projection
# (Wo), the attention-output dropout, the first residual and LN1 —
# removing the last two (N, D) HBM round trips and the remaining XLA-side
# dropout mask of the layer (reference layer body:
# dqn_policy/model.py:128-137).  Backward recomputes everything from
# (h_in, a_pre): stashed activations per layer drop to those two tensors.
# Mask draw order per tile is fixed (a, gelu, ffn2) so fwd and bwd see
# identical streams from the same seed.
# ---------------------------------------------------------------------------


def _recompute_tail(h_in, a_pre, wow_ref, wob_ref, ln1s_ref, ln1b_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, tile,
                    p: float, deterministic: bool, mid_drop: bool = True):
    """All forward intermediates for one row tile (shared fwd/bwd)."""
    inv = 1.0 / (1.0 - p)
    stoch = not (deterministic or p <= 0.0)
    if stoch:
        pltpu.prng_seed(seed_ref[0] + tile * jnp.int32(1000003))
    a = jax.lax.dot(a_pre.astype(wow_ref.dtype), wow_ref[...],
                    preferred_element_type=jnp.float32) + wob_ref[...]
    if stoch:
        bits1 = pltpu.bitcast(pltpu.prng_random_bits(a.shape), jnp.uint32)
        m1 = (_uniform_from_bits(bits1) >= p).astype(jnp.float32) * inv
        d1 = a * m1
    else:
        m1, d1 = None, a
    r1 = h_in.astype(jnp.float32) + d1
    h1hat, rstd1 = _ln_stats(r1)
    h1 = h1hat * ln1s_ref[...] + ln1b_ref[...]
    x1 = jax.lax.dot(h1.astype(w1_ref.dtype), w1_ref[...],
                     preferred_element_type=jnp.float32) + b1_ref[...]
    g = _gelu_exact(x1)
    if stoch and mid_drop:
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(g.shape), jnp.uint32)
        m2 = (_uniform_from_bits(bits2) >= p).astype(jnp.float32) * inv
        d2 = g * m2
    else:
        m2, d2 = None, g
    x2 = jax.lax.dot(d2.astype(w2_ref.dtype), w2_ref[...],
                     preferred_element_type=jnp.float32) + b2_ref[...]
    if stoch:
        bits3 = pltpu.bitcast(pltpu.prng_random_bits(x2.shape), jnp.uint32)
        m3 = (_uniform_from_bits(bits3) >= p).astype(jnp.float32) * inv
        d3 = x2 * m3
    else:
        m3, d3 = None, x2
    r2 = h1 + d3
    return a, m1, h1hat, rstd1, h1, x1, m2, d2, m3, r2


def _tail_fwd_kernel(seed_ref, h_ref, ap_ref, wow_ref, wob_ref,
                     l1s_ref, l1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     l2s_ref, l2b_ref, out_ref,
                     *, p: float, deterministic: bool, mid_drop: bool):
    tile = pl.program_id(0)
    *_, r2 = _recompute_tail(h_ref[...], ap_ref[...], wow_ref, wob_ref,
                             l1s_ref, l1b_ref, w1_ref, b1_ref, w2_ref,
                             b2_ref, seed_ref, tile, p, deterministic,
                             mid_drop)
    xhat, _ = _ln_stats(r2)
    out_ref[...] = (xhat * l2s_ref[...] + l2b_ref[...]).astype(out_ref.dtype)


def _tail_bwd_kernel(seed_ref, h_ref, ap_ref, wow_ref, wob_ref,
                     l1s_ref, l1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     l2s_ref, dout_ref,
                     dh_ref, dap_ref, dwow_ref, dwob_ref, dl1s_ref,
                     dl1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                     dl2s_ref, dl2b_ref, *, p: float, deterministic: bool,
                     mid_drop: bool):
    tile = pl.program_id(0)
    h_in = h_ref[...]
    a_pre = ap_ref[...]
    (a, m1, h1hat, rstd1, h1, x1, m2, d2, m3, r2) = _recompute_tail(
        h_in, a_pre, wow_ref, wob_ref, l1s_ref, l1b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, seed_ref, tile, p, deterministic,
        mid_drop)
    xhat2, rstd2 = _ln_stats(r2)
    dout = dout_ref[...].astype(jnp.float32)

    @pl.when(tile == 0)
    def _init():
        for ref in (dwow_ref, dwob_ref, dl1s_ref, dl1b_ref, dw1_ref,
                    db1_ref, dw2_ref, db2_ref, dl2s_ref, dl2b_ref):
            ref[...] = jnp.zeros_like(ref)

    # LN2 backward
    dxhat2 = dout * l2s_ref[...]
    dr2 = rstd2 * (dxhat2 - jnp.mean(dxhat2, axis=-1, keepdims=True)
                   - xhat2 * jnp.mean(dxhat2 * xhat2, axis=-1,
                                      keepdims=True))
    dl2s_ref[...] += jnp.sum(dout * xhat2, axis=0, keepdims=True)
    dl2b_ref[...] += jnp.sum(dout, axis=0, keepdims=True)

    # FFN backward (f32 dW operands: the MXU rounds to bf16 anyway,
    # interpret/CPU stays exact — same rationale as _bwd_kernel)
    dx2 = dr2 if m3 is None else dr2 * m3
    db2_ref[...] += jnp.sum(dx2, axis=0, keepdims=True)
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
        h1, dx1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh1 = dr2 + jax.lax.dot_general(
        dx1.astype(w1_ref.dtype), w1_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    # LN1 backward
    dxhat1 = dh1 * l1s_ref[...]
    dl1s_ref[...] += jnp.sum(dh1 * h1hat, axis=0, keepdims=True)
    dl1b_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
    dr1 = rstd1 * (dxhat1 - jnp.mean(dxhat1, axis=-1, keepdims=True)
                   - h1hat * jnp.mean(dxhat1 * h1hat, axis=-1,
                                      keepdims=True))

    # residual + attention-out dropout + Wo backward
    dh_ref[...] = dr1.astype(dh_ref.dtype)
    da = dr1 if m1 is None else dr1 * m1
    dwob_ref[...] += jnp.sum(da, axis=0, keepdims=True)
    dwow_ref[...] += jax.lax.dot_general(
        a_pre.astype(jnp.float32), da, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dap_ref[...] = jax.lax.dot_general(
        da.astype(wow_ref.dtype), wow_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dap_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def attn_tail_block(h_in, a_pre, wow, wob, ln1s, ln1b, w1, b1, w2, b2,
                    ln2s, ln2b, seed, p: float, block: int = 256,
                    interpret: bool = False, mid_drop: bool = True):
    """(h_in, a_pre) (N, D) -> LN2(h1 + FFN-tail(h1)), h1 = LN1(h_in +
    drop(Wo @ a_pre)), fully fused.  `seed` as in ffn_block.

    `mid_drop=False` omits the post-gelu dropout site (the Longformer/BERT
    layer convention, models/longformer.py: dropout only after the
    attention projection and after ffn2)."""
    out, _ = _tail_fwd(h_in, a_pre, wow, wob, ln1s, ln1b, w1, b1, w2, b2,
                       ln2s, ln2b, seed, p, block, interpret, mid_drop)
    return out


def _tail_fwd(h_in, a_pre, wow, wob, ln1s, ln1b, w1, b1, w2, b2,
              ln2s, ln2b, seed, p, block, interpret, mid_drop=True):
    n, d = h_in.shape
    di = w1.shape[1]
    deterministic = (p is None) or (p <= 0.0)
    hp, nb, _ = _pack_rows(h_in, block)
    app, _, _ = _pack_rows(a_pre, block)
    row = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_tail_fwd_kernel, p=float(p or 0.0),
                          deterministic=deterministic, mid_drop=mid_drop),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # h_in tile
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # a_pre tile
            row(d, d), row(1, d),                             # wo w/b
            row(1, d), row(1, d),                             # ln1 s/b
            row(d, di), row(1, di), row(di, d), row(1, d),    # w1 b1 w2 b2
            row(1, d), row(1, d),                             # ln2 s/b
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * block, d), h_in.dtype),
        compiler_params=(None if interpret else
                         pltpu.CompilerParams(vmem_limit_bytes=100 << 20)),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1,), hp, app, wow,
      wob.reshape(1, d), ln1s.reshape(1, d), ln1b.reshape(1, d),
      w1, b1.reshape(1, di), w2, b2.reshape(1, d),
      ln2s.reshape(1, d), ln2b.reshape(1, d))
    return out[:n], (h_in, a_pre, wow, wob, ln1s, ln1b, w1, b1, w2, b2,
                     ln2s, ln2b, seed)


def _tail_bwd(p, block, interpret, mid_drop, res, dout):
    (h_in, a_pre, wow, wob, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b,
     seed) = res
    n, d = h_in.shape
    di = w1.shape[1]
    deterministic = (p is None) or (p <= 0.0)
    hp, nb, _ = _pack_rows(h_in, block)
    app, _, _ = _pack_rows(a_pre, block)
    doutp, _, _ = _pack_rows(dout.astype(h_in.dtype), block)
    row = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0))
    outs = pl.pallas_call(
        functools.partial(_tail_bwd_kernel, p=float(p or 0.0),
                          deterministic=deterministic, mid_drop=mid_drop),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # h_in tile
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # a_pre tile
            row(d, d), row(1, d),                             # wo w/b
            row(1, d), row(1, d),                             # ln1 s/b
            row(d, di), row(1, di), row(di, d), row(1, d),    # w1 b1 w2 b2
            row(1, d),                                        # ln2 scale
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # dout tile
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # dh_in
            pl.BlockSpec((block, d), lambda i: (i, 0)),       # da_pre
            row(d, d), row(1, d),                             # dwo w/b
            row(1, d), row(1, d),                             # dln1 s/b
            row(d, di), row(1, di), row(di, d), row(1, d),    # dw1..db2
            row(1, d), row(1, d),                             # dln2 s/b
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * block, d), h_in.dtype),
            jax.ShapeDtypeStruct((nb * block, d), h_in.dtype),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
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
    )(jnp.asarray(seed, jnp.int32).reshape(1,), hp, app, wow,
      wob.reshape(1, d), ln1s.reshape(1, d), ln1b.reshape(1, d),
      w1, b1.reshape(1, di), w2, b2.reshape(1, d), ln2s.reshape(1, d),
      doutp)
    (dh, dap, dwow, dwob, dl1s, dl1b, dw1, db1, dw2, db2, dl2s,
     dl2b) = outs
    import numpy as onp
    dseed = onp.zeros(onp.shape(seed), jax.dtypes.float0)
    return (dh[:n], dap[:n], dwow.astype(wow.dtype),
            dwob[0].astype(wob.dtype), dl1s[0].astype(ln1s.dtype),
            dl1b[0].astype(ln1b.dtype), dw1.astype(w1.dtype),
            db1[0].astype(b1.dtype), dw2.astype(w2.dtype),
            db2[0].astype(b2.dtype), dl2s[0].astype(ln2s.dtype),
            dl2b[0].astype(ln2b.dtype), dseed)


attn_tail_block.defvjp(_tail_fwd, _tail_bwd)
