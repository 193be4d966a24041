"""Persistent whole-sequence decode kernel v6: the TRANSPOSED network.

v5 (ops/decode_kernel_v5.py) showed the decode wall at B=512 is the
per-chunk VPU state math, not HBM bandwidth: its (bb, E, D) batch-major
layout makes every per-head outer product a lane<->sublane broadcast that
Mosaic lowers at ~4% of VPU peak (in-situ ablations, BENCH.md: skeleton
2783us, +matmuls 2839us, +chunk math 4046us at B=512).

v6 eliminates those relayouts by carrying the ENTIRE network transposed —
batch on lanes, features on sublanes:

  * hidden state hT (D, B) f32 in VMEM scratch; all weight matmuls use
    pre-transposed weights (W^T on the MXU, packed once on host);
  * recurrent state s6 (L, D, E, B) where s6[l, i*E+j, u, b] =
    S_{head i}[j, u] for batch row b, streamed per (layer, head) by a
    nested `pltpu.emit_pipeline` — each chunk IS one head's (E, E, B)
    block, so
      - K* = broadcast kT_i (E,1,B) over the sublane (u) axis   [native]
      - V* = broadcast vT_i (1,E,B) over the outer  (j) axis    [native]
      - upd = K* * V*, s += upd                                  [3D vec]
      - num_i = sum_j Q* * s_new  -> reduce over the OUTER axis  [slab adds]
    no lane<->sublane data movement anywhere;
  * per-field sampling on the transposed (NF*VF_PAD, B) logits: the
    sort-free nucleus threshold + Gumbel-argmax reduce over the sublane
    (vocab) axis of the (NF, VF_PAD, B) view;
  * tokens are emitted transposed (T, NF, B); the wrapper returns them
    (T, B, NF) with one host-free jnp transpose at the end.

Same role as v5: replaces the reference's per-token GPU->host->numpy round
trip (dqn_policy/testing-no-type-cp.py:126-179 + model.py:259-298) and the
fast_transformers recurrent CUDA path (model.py:141-150).

Numerics contract (measured, r3): TPU MXU matmuls round f32 inputs to
bfloat16, and the transposed layout accumulates in a different order than
XLA's batch-major layout, so per-step activations differ by ~0.3% median
relative — NOT sub-ulp.  Teacher-forced greedy argmax agrees with the XLA
path on ~98.4% of (field, song) decisions per step with bf16 weights
(99.7% with f32 weights, where ties are rarer); autoregressive
greedy streams therefore diverge at near-ties after a few dozen tokens.
Exact-stream equality vs the XLA path is NOT the contract — chunk
invariance (same kernel, different chunking => identical streams) and
teacher-forced agreement are (tests/test_persistent_decode_tpu.py).
Stochastic sampling is distribution-equal by the Gumbel-max argument.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from .decode_kernel_v3 import _gelu_exact, _phi
from .decode_common import NEG, VF_PAD, gumbel_from_bits
from .linear_attention import DEFAULT_EPS


def _lnT(x, scale_col, bias_col, eps=1e-5):
    """Layernorm over the feature (sublane/outer) axis 0 of (D, B)."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=0, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale_col + bias_col


def _col(slab):
    """(rows, 128) lane-replicated slab -> (rows, 1) column."""
    return jnp.max(slab, axis=-1, keepdims=True)


class V6Params(NamedTuple):
    """All column vectors (biases/scales) are stored 128-lane-replicated:
    a (rows, 1) block would violate Mosaic's 128-lane slice tiling, so the
    kernel lane-reduces each (rows, 128) slab back to a (rows, 1) column
    (see `_col`)."""
    qkvwT: jax.Array   # (L, 3D, D) bf16, rows [q | k | v] head-major
    wowT: jax.Array    # (L, D, D) bf16 (= Wo^T per layer)
    f1wT: jax.Array    # (L, DI, D) bf16
    f2wT: jax.Array    # (L, D, DI) bf16
    qkvbT: jax.Array   # (L, 3D, 128) f32
    wobT: jax.Array    # (L, D, 128) f32
    l1sT: jax.Array    # (L, D, 128) f32
    l1bT: jax.Array
    l2sT: jax.Array
    l2bT: jax.Array
    f1bT: jax.Array    # (L, DI, 128) f32
    f2bT: jax.Array    # (L, D, 128) f32
    membT: jax.Array   # (D, Vpad) f32: (scaled embeds @ in_linear)^T
    binrT: jax.Array   # (D, 128) f32
    whpT: jax.Array    # (NF*VF_PAD, D) bf16, field f at rows f*256..
    bhpT: jax.Array    # (NF*VF_PAD, 128) f32, NEG at padding
    flsT: jax.Array    # (D, 128) f32
    flbT: jax.Array
    pe: jax.Array      # (max_len, D) f32 sinusoidal table (row per step)


def make_v6_params(params: dict, cfg, pe_table, dtype=jnp.bfloat16
                   ) -> V6Params:
    from ..models import common as cm
    lp = params["layers"]
    f32 = jnp.float32
    tr = lambda w: jnp.swapaxes(w.astype(dtype), -1, -2)
    col = lambda x: jnp.broadcast_to(
        x.astype(f32)[..., :, None], x.shape + (128,))

    qkvw = jnp.concatenate(
        [lp["wq"]["w"], lp["wk"]["w"], lp["wv"]["w"]], axis=-1)
    qkvb = jnp.concatenate(
        [lp["wq"]["b"], lp["wk"]["b"], lp["wv"]["b"]], axis=-1)

    names = cm.field_names(cfg.n_fields)
    win = params["in_linear"]["w"].astype(f32)
    rows, off = [], 0
    for n, de in zip(names, cfg.emb_sizes):
        tbl = params["emb"][n].astype(f32) * math.sqrt(de)
        rows.append(tbl @ win[off:off + de])
        off += de
    m = jnp.concatenate(rows, axis=0)                    # (sum V_f, D)
    vpad = -(-m.shape[0] // 128) * 128
    m = jnp.pad(m, ((0, vpad - m.shape[0]), (0, 0)))

    d = cfg.d_model
    wh = jnp.zeros((d, cfg.n_fields * VF_PAD), f32)
    bh = jnp.full((cfg.n_fields * VF_PAD,), NEG, f32)
    for f, (n, v) in enumerate(zip(names, cfg.vocab_sizes)):
        wh = wh.at[:, f * VF_PAD:f * VF_PAD + v].set(
            params["heads"][n]["w"].astype(f32))
        bh = bh.at[f * VF_PAD:f * VF_PAD + v].set(
            params["heads"][n]["b"].astype(f32))

    return V6Params(
        qkvwT=tr(qkvw), wowT=tr(lp["wo"]["w"]),
        f1wT=tr(lp["ffn1"]["w"]), f2wT=tr(lp["ffn2"]["w"]),
        qkvbT=col(qkvb), wobT=col(lp["wo"]["b"]),
        l1sT=col(lp["ln1"]["scale"]), l1bT=col(lp["ln1"]["bias"]),
        l2sT=col(lp["ln2"]["scale"]), l2bT=col(lp["ln2"]["bias"]),
        f1bT=col(lp["ffn1"]["b"]), f2bT=col(lp["ffn2"]["b"]),
        membT=m.T, binrT=col(params["in_linear"]["b"]),
        whpT=wh.T.astype(dtype), bhpT=col(bh),
        flsT=col(params["final_ln"]["scale"]),
        flbT=col(params["final_ln"]["bias"]),
        pe=pe_table.astype(f32))


def pack_state_v6(s: jax.Array, z: jax.Array):
    """DecodeState (L,B,H,E,E),(L,B,H,E) -> v6 (L,D,E,B),(L,D,B)."""
    L, b, h, e, _ = s.shape
    s6 = s.transpose(0, 2, 3, 4, 1).reshape(L, h * e, e, b)
    z6 = z.transpose(0, 2, 3, 1).reshape(L, h * e, b)
    return s6, z6


def unpack_state_v6(s6: jax.Array, z6: jax.Array, n_head: int):
    L, d, e, b = s6.shape
    h = n_head
    s = s6.reshape(L, h, e, e, b).transpose(0, 4, 1, 2, 3)
    z = z6.reshape(L, h, e, b).transpose(0, 3, 1, 2)
    return s, z


def nucleus_keep_sub(p: jax.Array, top_p: jax.Array, iters: int = 24
                     ) -> jax.Array:
    """Sort-free nucleus keep-mask reducing over axis 1 of (NF, V, B).
    Same bisection as decode_kernel_v5.nucleus_keep_by_threshold."""
    lo = jnp.zeros_like(p[:, :1, :])
    hi = jnp.ones_like(p[:, :1, :])

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(p > mid, p, 0.0), axis=1, keepdims=True)
        pred = mass > top_p
        return jnp.where(pred, mid, lo), jnp.where(pred, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return p > lo


def argmax_first_sub(score: jax.Array) -> jax.Array:
    """First-maximal index over axis 1 of (NF, V, B) -> (NF, 1, B) int32."""
    m = jnp.max(score, axis=1, keepdims=True)
    n = score.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    return jnp.min(jnp.where(score == m, iota, n), axis=1, keepdims=True)


# gumbel_from_bits, VF_PAD, NEG live in decode_common (shared with the
# Mosaic uint32 workaround lives in one place)


def _v6_kernel(seed_ref, tok0T_ref, peT_ref, membT_ref, binrT_ref, whpT_ref,
               bhpT_ref, flsT_ref, flbT_ref,
               qkvbT, wobT, l1sT, l1bT, l2sT, l2bT, f1bT, f2bT,
               qkvwT, wowT, f1wT_hbm, f2wT_hbm, s_hbm, z_hbm,
               tokT_out_ref, s_out_hbm, z_out_hbm,
               hT_scr, tokT_scr, qkvT_scr, numT_scr, den_scr, f1T_scr,
               f2T_scr, cnt_scr, sem1, sem2,
               *, n_layer: int, n_head: int, d_head: int,
               vocab_sizes: Tuple[int, ...], temps: Tuple[float, ...],
               topps: Tuple[float, ...], greedy: bool, eps: float):
    t = pl.program_id(0)
    d, b = hT_scr.shape
    e = d_head
    nf = len(vocab_sizes)

    @pl.when(t == 0)
    def _init_tok():
        tokT_scr[...] = tok0T_ref[...]

    # ---- embedding: membT @ onehotT + biases + pe column ----
    offs, off = [], 0
    for v in vocab_sizes:
        offs.append(off)
        off += v
    vpad = membT_ref.shape[1]
    subs = jax.lax.broadcasted_iota(jnp.int32, (vpad, b), 0)
    oh = jnp.zeros((vpad, b), jnp.float32)
    for f in range(nf):
        gid = tokT_scr[f:f + 1, :] + offs[f]           # (1, B)
        oh = oh + (subs == gid).astype(jnp.float32)
    # pe arrives 128-lane-replicated (a (D, 1) lane-slice block would
    # violate Mosaic's 128-lane slice tiling); lane-reduce recovers the
    # (D, 1) column
    pe_col = _col(peT_ref[0])
    h0 = (jnp.dot(membT_ref[...], oh, preferred_element_type=jnp.float32)
          + _col(binrT_ref[...]) + pe_col)
    hT_scr[...] = h0

    # ---- layer stack: nested pipeline over (L, heads) ----
    # chunk == one head's (E, E, B) state block; position from an SMEM
    # counter (the pipeline body runs sequentially).
    cnt_scr[0] = 0

    def inner(qkvbT_ref, wobT_ref, l1sT_ref, l1bT_ref, l2sT_ref, l2bT_ref,
              f1bT_ref, f2bT_ref, qkvwT_ref, wowT_ref,
              s_ref, z_ref, s_out_ref, z_out_ref):
        c = cnt_scr[0]
        l = c // n_head
        i = c % n_head
        cnt_scr[0] = c + 1
        rows = pl.dslice(i * e, e)

        @pl.when(i == 0)
        def _layer_head():
            pltpu.make_async_copy(f1wT_hbm.at[l], f1T_scr, sem1).start()
            pltpu.make_async_copy(f2wT_hbm.at[l], f2T_scr, sem2).start()
            qkvT = jnp.dot(qkvwT_ref[0], hT_scr[...].astype(qkvwT_ref.dtype),
                           preferred_element_type=jnp.float32
                           ) + _col(qkvbT_ref[0])
            qkvT_scr[...] = jnp.concatenate(
                [_phi(qkvT[:2 * d]), qkvT[2 * d:]], axis=0)

        qT = qkvT_scr[rows, :]                          # (E, B) phi(q) head i
        kT = qkvT_scr[pl.dslice(d + i * e, e), :]       # (E, B) phi(k)
        vT = qkvT_scr[pl.dslice(2 * d + i * e, e), :]   # (E, B)

        # all broadcasts in native directions: j on the outer axis,
        # u on sublanes, b on lanes
        K = jnp.broadcast_to(kT[:, None, :], (e, e, b))     # over u (sublane)
        V = jnp.broadcast_to(vT[None, :, :], (e, e, b))     # over j (outer)
        # state may be stored sub-f32 (halves the dominant HBM traffic);
        # accumulate in f32, round only on store
        s_new = s_ref[0].astype(jnp.float32) + K * V        # (E_j, E_u, B)
        s_out_ref[0] = s_new.astype(s_out_ref.dtype)
        z_new = z_ref[0].astype(jnp.float32) + kT           # (E, B)
        z_out_ref[0] = z_new.astype(z_out_ref.dtype)

        Q = jnp.broadcast_to(qT[:, None, :], (e, e, b))
        numT_scr[rows, :] = jnp.sum(Q * s_new, axis=0)      # (E_u, B)
        den_scr[pl.dslice(i, 1), :] = jnp.sum(qT * z_new, axis=0,
                                              keepdims=True)

        @pl.when(i == n_head - 1)
        def _layer_tail():
            den = jnp.broadcast_to(den_scr[...][:, None, :],
                                   (n_head, e, b)).reshape(d, b)
            attT = numT_scr[...] / (den + eps)
            aoT = jnp.dot(wowT_ref[0], attT.astype(wowT_ref.dtype),
                          preferred_element_type=jnp.float32)
            h1 = _lnT(hT_scr[...] + aoT + _col(wobT_ref[0]),
                      _col(l1sT_ref[0]), _col(l1bT_ref[0]))
            pltpu.make_async_copy(f1wT_hbm.at[l], f1T_scr, sem1).wait()
            pltpu.make_async_copy(f2wT_hbm.at[l], f2T_scr, sem2).wait()
            y = jnp.dot(f1T_scr[...], h1.astype(f1T_scr.dtype),
                        preferred_element_type=jnp.float32
                        ) + _col(f1bT_ref[0])
            y = _gelu_exact(y)
            y = jnp.dot(f2T_scr[...], y.astype(f2T_scr.dtype),
                        preferred_element_type=jnp.float32
                        ) + _col(f2bT_ref[0])
            hT_scr[...] = _lnT(h1 + y, _col(l2sT_ref[0]),
                               _col(l2bT_ref[0]))

    L = n_layer
    small = lambda shape, imap: pl.BlockSpec(shape, imap)
    pipeline = pltpu.emit_pipeline(
        inner,
        grid=(L, n_head),
        in_specs=[
            small((1, 3 * d, 128), lambda l, i: (l, 0, 0)),        # qkvbT
            small((1, d, 128), lambda l, i: (l, 0, 0)),            # wobT
            small((1, d, 128), lambda l, i: (l, 0, 0)),            # l1sT
            small((1, d, 128), lambda l, i: (l, 0, 0)),            # l1bT
            small((1, d, 128), lambda l, i: (l, 0, 0)),            # l2sT
            small((1, d, 128), lambda l, i: (l, 0, 0)),            # l2bT
            small((1, f1bT.shape[1], 128), lambda l, i: (l, 0, 0)),  # f1bT
            small((1, d, 128), lambda l, i: (l, 0, 0)),            # f2bT
            small((1, 3 * d, d), lambda l, i: (l, 0, 0)),         # qkvwT
            small((1, d, d), lambda l, i: (l, 0, 0)),             # wowT
            small((1, d_head, d_head, b), lambda l, i: (l, i, 0, 0)),  # s
            small((1, d_head, b), lambda l, i: (l, i, 0)),             # z
        ],
        out_specs=[
            small((1, d_head, d_head, b), lambda l, i: (l, i, 0, 0)),
            small((1, d_head, b), lambda l, i: (l, i, 0)),
        ],
    )
    pipeline(qkvbT, wobT, l1sT, l1bT, l2sT, l2bT, f1bT, f2bT,
             qkvwT, wowT, s_hbm, z_hbm, s_out_hbm, z_out_hbm)

    # ---- heads + sampling on the transposed (NF*VF_PAD, B) logits ----
    hf = _lnT(hT_scr[...], _col(flsT_ref[...]), _col(flbT_ref[...]))
    logitsT = jnp.dot(whpT_ref[...], hf.astype(whpT_ref.dtype),
                      preferred_element_type=jnp.float32
                      ) + _col(bhpT_ref[...])
    # per-field inverse temperature as a (NF*VF_PAD, 1) column (a (NF,1,1)
    # constant would need a sublane+lane double broadcast, unsupported)
    frow = jax.lax.broadcasted_iota(jnp.int32, (nf * VF_PAD, 1), 0) // VF_PAD
    tinv = jnp.zeros((nf * VF_PAD, 1), jnp.float32)
    for f in range(nf):
        tinv = jnp.where(frow == f, 1.0 / temps[f], tinv)
    x = (logitsT * tinv).reshape(nf, VF_PAD, b)

    if greedy:
        tok3 = argmax_first_sub(x)                       # (NF, 1, B)
    else:
        m = jnp.max(x, axis=1, keepdims=True)
        ex = jnp.exp(x - m)
        p = ex / (jnp.sum(ex, axis=1, keepdims=True) * (1.0 + 1e-5))
        topp = jnp.concatenate(
            [jnp.full((1, 1, 1), topps[f], jnp.float32) for f in range(nf)],
            axis=0)
        keep = nucleus_keep_sub(p, topp)
        pltpu.prng_seed(seed_ref[0] + t * jnp.int32(2654435761 & 0x7FFFFFFF))
        bits = pltpu.prng_random_bits((nf * VF_PAD, b)).reshape(
            nf, VF_PAD, b)
        g = gumbel_from_bits(pltpu.bitcast(bits, jnp.uint32))
        score = jnp.where(keep, x + g, NEG)
        tok3 = argmax_first_sub(score)

    tokT = tok3.reshape(nf, b).astype(jnp.int32)
    tokT_out_ref[0] = tokT
    tokT_scr[...] = tokT


def fused_decode_v6(v6p: V6Params, tok0T: jax.Array, s6: jax.Array,
                    z6: jax.Array, t0, seed: jax.Array, *,
                    n_head: int, max_tokens: int,
                    vocab_sizes: Tuple[int, ...],
                    temps: Tuple[float, ...], topps: Tuple[float, ...],
                    greedy: bool = False, eps: float = DEFAULT_EPS):
    """Decode `max_tokens` tokens in one pallas_call (transposed network).

    Contract (parity-verified by scripts/profile_decode_v6.py): tok0T
    (nf, B) int32 is the next token TO BE FED — the kernel embeds it,
    updates the state with it, and emits its successor.  s6/z6 is the
    packed state BEFORE tok0T; t0 is the position tok0T is fed at
    (selects its pe column).  Returns (tokensT (T, nf, B) int32, s6', z6')
    where s6' reflects tok0T plus the first T-1 emitted tokens (the last
    emitted token is sampled but not yet fed — pass it as the next call's
    tok0T)."""
    nf, b = tok0T.shape
    L, d, e, _ = s6.shape
    di = v6p.f1wT.shape[1]
    T = max_tokens
    # pe columns for steps t0..t0+T-1, replicated across 128 lanes so the
    # per-step block is lane-tile aligned (see kernel comment)
    pe_rows = jax.lax.dynamic_slice_in_dim(v6p.pe, t0, T, axis=0)  # (T, D)
    peT128 = jnp.broadcast_to(pe_rows[:, :, None], (T, d, 128))

    kernel = functools.partial(
        _v6_kernel, n_layer=L, n_head=n_head, d_head=e,
        vocab_sizes=tuple(vocab_sizes), temps=tuple(temps),
        topps=tuple(topps), greedy=greedy, eps=eps)

    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    vpad = v6p.membT.shape[1]
    tokensT, s_out, z_out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((nf, b), lambda t: (0, 0)),          # tok0T
            pl.BlockSpec((1, d, 128), lambda t: (t, 0, 0)),   # pe slab
            pl.BlockSpec((d, vpad), lambda t: (0, 0)),        # membT
            pl.BlockSpec((d, 128), lambda t: (0, 0)),         # binrT
            pl.BlockSpec((nf * VF_PAD, d), lambda t: (0, 0)),  # whpT
            pl.BlockSpec((nf * VF_PAD, 128), lambda t: (0, 0)),  # bhpT
            pl.BlockSpec((d, 128), lambda t: (0, 0)),         # flsT
            pl.BlockSpec((d, 128), lambda t: (0, 0)),         # flbT
            anyspec, anyspec, anyspec, anyspec, anyspec, anyspec,
            anyspec, anyspec,                                 # biases
            anyspec, anyspec, anyspec, anyspec,               # big weights
            anyspec, anyspec,                                 # s z
        ],
        out_specs=[
            pl.BlockSpec((1, nf, b), lambda t: (t, 0, 0)),
            anyspec, anyspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, nf, b), jnp.int32),
            jax.ShapeDtypeStruct(s6.shape, s6.dtype),
            jax.ShapeDtypeStruct(z6.shape, z6.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, b), jnp.float32),                  # hT
            pltpu.VMEM((nf, b), jnp.int32),                   # tokT
            pltpu.VMEM((3 * d, b), jnp.float32),              # phi(q)|phi(k)|v
            pltpu.VMEM((d, b), jnp.float32),                  # numT
            pltpu.VMEM((n_head, b), jnp.float32),             # den
            pltpu.VMEM((di, d), v6p.f1wT.dtype),              # f1T
            pltpu.VMEM((d, di), v6p.f2wT.dtype),              # f2T
            pltpu.SMEM((1,), jnp.int32),                      # (l, i) ctr
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={21: 1, 22: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 << 20),
        )(jnp.asarray([seed], jnp.int32).reshape(1,), tok0T, peT128,
          v6p.membT, v6p.binrT, v6p.whpT, v6p.bhpT, v6p.flsT, v6p.flbT,
          v6p.qkvbT, v6p.wobT, v6p.l1sT, v6p.l1bT, v6p.l2sT, v6p.l2bT,
          v6p.f1bT, v6p.f2bT, v6p.qkvwT, v6p.wowT, v6p.f1wT, v6p.f2wT,
          s6, z6)
    return tokensT, s_out, z_out
