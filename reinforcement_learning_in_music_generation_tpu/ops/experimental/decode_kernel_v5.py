"""Persistent whole-SEQUENCE decode kernel (v5): one program per token.

v4 (ops/decode_kernel_v4.py) fuses one decode step into one pallas_call but
still pays (L, H/2, NB) = 384 program launches per token at B=256 — ~7us of
program latency each, which IS the step time.  v5 collapses the entire
T-token generation into ONE pallas_call with grid (T,): each program decodes
one token end-to-end —

  * embedding lookup as a one-hot MXU matmul against a pre-folded
    (vocab_cat, D) matrix M = scaled_embed @ in_linear (no gathers);
  * all 12 layers via a nested `pltpu.emit_pipeline` over (L, NB): the
    (L, B, E, H*E) recurrent state and qkv/out weights stream HBM->VMEM with
    double buffering; FFN weights are manually single-buffered (one async
    copy per layer, started before the first batch chunk's attention);
  * per-field temperature/nucleus sampling IN-KERNEL: the nucleus keep-set
    is found by a 24-step binary search for the probability threshold
    (sort-free; see `nucleus_keep_by_threshold`), then one Gumbel-argmax
    over the kept set using the on-core PRNG (`pltpu.prng_random_bits`).
    Greedy mode is a plain masked argmax (token-exact vs the XLA path).
  * the sampled token lands in persistent VMEM scratch and seeds the next
    program's embedding — the whole sequential loop never leaves the chip.

Replaces the reference's per-token GPU->host->numpy round trip
(dqn_policy/testing-no-type-cp.py:126-179 + model.py:259-298) and the
fast_transformers recurrent CUDA path (model.py:141-150).

Numerics: f32 state and f32 attention math with the same op structure as
decode_step / v3 / v4 (same _phi/_ln/_gelu_exact).  Greedy decode is
prefix-exact vs the XLA path for ~18-21 steps, after which sub-ulp f32
accumulation-order differences (fused qkv/out matmuls vs separate ones)
flip argmax near-ties — measured, not a logic bug; the stochastic RNG
stream differs from the XLA sampler by design (distribution-equal).

STATUS (round 2, measured on v5e): the early 'B>=128 compile-helper
crash' was a silent scoped-VMEM overflow — with
CompilerParams(vmem_limit_bytes=100MB) v5 runs at every batch
(B=512: 126.7K tok/s, sampling included, matching the v4 path).  The
remaining wall is the VPU cost of the batch-major state math (in-situ
ablations via RLMG_V5_ABLATE: skeleton 2783us, +matmuls 2839us, +chunk
math 4046us at B=512) — which ops/decode_kernel_v6.py removes by
transposing the whole network (301.6K tok/s, the production path).  v5
is kept for the ablation instrumentation and as the batch-major
reference implementation.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from ..decode_kernel_v3 import _gelu_exact, _ln, _phi
from ..linear_attention import DEFAULT_EPS
from ..decode_common import NEG, VF_PAD, gumbel_from_bits  # noqa: F401

# Perf-ablation knob (profiling only — output is garbage when set):
#   "state"  -> inner pipeline copies state through without attention math
#   "attn"   -> state math runs but num/den path skipped
# Used by scripts/profile_decode_v5.py to attribute the step time.
_ABLATE = os.environ.get("RLMG_V5_ABLATE", "")


# ---------------------------------------------------------------------------
# Sampling math (pure jnp; unit-tested on CPU, called inside the kernel)
# ---------------------------------------------------------------------------


def nucleus_keep_by_threshold(p: jax.Array, top_p: jax.Array,
                              iters: int = 24) -> jax.Array:
    """Sort-free nucleus keep-mask over the last axis.

    The reference keep-set (dqn_policy/model.py:31-45) is the descending-
    sorted prefix up to and including the first prob whose cumulative sum
    crosses top_p; equivalently token i is kept iff
    mass{p_j > p_i} <= top_p.  That set is {p_i > tau} where tau is the
    largest value with mass{p > tau} > top_p — found here by bisection on
    tau (monotone step function), `iters` halvings (2^-24 resolution, below
    f32 prob spacing).  Exact-tie tokens at the boundary are all kept
    (the sorted form keeps only the first by index — measure-zero for
    continuous logits).  top_p = +inf keeps the whole support (p > 0).
    """
    lo = jnp.zeros_like(p[..., :1])
    hi = jnp.ones_like(p[..., :1])

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(p > mid, p, 0.0), axis=-1, keepdims=True)
        pred = mass > top_p
        return jnp.where(pred, mid, lo), jnp.where(pred, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return p > lo



def argmax_first(score: jax.Array) -> jax.Array:
    """Argmax over the last axis returning the FIRST maximal index (matches
    numpy/jnp argmax tie behavior), as a (..., 1) int32 — 2D-friendly for
    Mosaic (no 1-D vectors)."""
    m = jnp.max(score, axis=-1, keepdims=True)
    n = score.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, score.shape, score.ndim - 1)
    return jnp.min(jnp.where(score == m, iota, n), axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------


class V5Params(NamedTuple):
    qkvw: jax.Array    # (L, D, 3D) bf16, columns [q | k | v], head-major
    wow: jax.Array     # (L, D, D) bf16
    f1w: jax.Array     # (L, D, DI) bf16
    f2w: jax.Array     # (L, DI, D) bf16
    qkvb: jax.Array    # (L, 1, 3D) f32
    wob: jax.Array     # (L, 1, D) f32
    l1s: jax.Array     # (L, 1, D) f32
    l1b: jax.Array
    l2s: jax.Array
    l2b: jax.Array
    f1b: jax.Array     # (L, 1, DI) f32
    f2b: jax.Array     # (L, 1, D) f32
    memb: jax.Array    # (Vpad, D) bf16: scaled embedding tables @ in_linear
    binr: jax.Array    # (1, D) f32: in_linear bias
    whp: jax.Array     # (D, 6*VF_PAD) bf16 heads, field f at lanes f*256..
    bhp: jax.Array     # (1, 6*VF_PAD) f32, NEG at padding
    fls: jax.Array     # (1, D) f32 final layernorm scale
    flb: jax.Array     # (1, D) f32


def make_v5_params(params: dict, cfg, dtype=jnp.bfloat16) -> V5Params:
    from ...models import common as cm
    lp = params["layers"]
    L, d, _ = lp["wq"]["w"].shape
    f32 = jnp.float32
    qkvw = jnp.concatenate(
        [lp["wq"]["w"], lp["wk"]["w"], lp["wv"]["w"]], axis=-1)
    qkvb = jnp.concatenate(
        [lp["wq"]["b"], lp["wk"]["b"], lp["wv"]["b"]], axis=-1)

    # embedding fold: h0 = concat_f(emb_f[tok_f] * sqrt(d_f)) @ Win + b
    #               = onehot_cat @ M + b,  M rows = scaled tables @ Win rows
    names = cm.field_names(cfg.n_fields)
    win = params["in_linear"]["w"].astype(f32)
    rows, off = [], 0
    import math
    for n, v, de in zip(names, cfg.vocab_sizes, cfg.emb_sizes):
        tbl = params["emb"][n].astype(f32) * math.sqrt(de)
        rows.append(tbl @ win[off:off + de])
        off += de
    m = jnp.concatenate(rows, axis=0)                    # (sum V_f, D)
    vpad = -(-m.shape[0] // 128) * 128
    m = jnp.pad(m, ((0, vpad - m.shape[0]), (0, 0)))

    # heads, padded to VF_PAD lanes per field, bias NEG on padding
    wh = jnp.zeros((d, cfg.n_fields * VF_PAD), f32)
    bh = jnp.full((1, cfg.n_fields * VF_PAD), NEG, f32)
    for f, (n, v) in enumerate(zip(names, cfg.vocab_sizes)):
        wh = wh.at[:, f * VF_PAD:f * VF_PAD + v].set(
            params["heads"][n]["w"].astype(f32))
        bh = bh.at[:, f * VF_PAD:f * VF_PAD + v].set(
            params["heads"][n]["b"].astype(f32)[None])

    pad1 = lambda x: x.astype(f32)[:, None, :]
    return V5Params(
        qkvw=qkvw.astype(dtype), wow=lp["wo"]["w"].astype(dtype),
        f1w=lp["ffn1"]["w"].astype(dtype), f2w=lp["ffn2"]["w"].astype(dtype),
        qkvb=pad1(qkvb), wob=pad1(lp["wo"]["b"]),
        l1s=pad1(lp["ln1"]["scale"]), l1b=pad1(lp["ln1"]["bias"]),
        l2s=pad1(lp["ln2"]["scale"]), l2b=pad1(lp["ln2"]["bias"]),
        f1b=pad1(lp["ffn1"]["b"]), f2b=pad1(lp["ffn2"]["b"]),
        # memb stays f32: M rows ARE the f32-accumulated products the XLA
        # path computes at runtime, so the folded embedding is bit-equal;
        # rounding M to bf16 flips greedy near-ties ~20 steps in.
        memb=m, binr=params["in_linear"]["b"].astype(f32)[None],
        whp=wh.astype(dtype), bhp=bh,
        fls=params["final_ln"]["scale"].astype(f32)[None],
        flb=params["final_ln"]["bias"].astype(f32)[None])


def pack_state(s: jax.Array, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """DecodeState layout (L,B,H,E,E),(L,B,H,E) -> v5 (L,B,E,H*E),(L,B,H*E)."""
    L, b, h, e, _ = s.shape
    return (s.transpose(0, 1, 3, 2, 4).reshape(L, b, e, h * e),
            z.reshape(L, b, h * e))


def unpack_state(s5: jax.Array, z5: jax.Array, n_head: int):
    L, b, e, d = s5.shape
    h = n_head
    return (s5.reshape(L, b, e, h, e).transpose(0, 1, 3, 2, 4),
            z5.reshape(L, b, h, e))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _v5_kernel(seed_ref, tok0_ref, pe_ref, memb_ref, binr_ref, whp_ref,
               bhp_ref, fls_ref, flb_ref,
               qkvb, wob, l1s, l1b, l2s, l2b, f1b, f2b,
               qkvw, wow, f1w_hbm, f2w_hbm, s_hbm, z_hbm,
               tok_out_ref, s_out_hbm, z_out_hbm,
               h_scr, tok_scr, qkv_scr, num_scr, zf_scr, f1_scr, f2_scr,
               cnt_scr, sem1, sem2,
               *, n_layer: int, n_head: int, d_head: int, bb: int,
               vocab_sizes: Tuple[int, ...], temps: Tuple[float, ...],
               topps: Tuple[float, ...], greedy: bool, eps: float):
    t = pl.program_id(0)
    b, d = h_scr.shape
    e = d_head
    nf = len(vocab_sizes)
    n_bblk = b // bb

    @pl.when(t == 0)
    def _init_tok():
        tok_scr[...] = tok0_ref[...]

    # ---- embedding: one-hot @ M (MXU), + in_linear bias + pos-enc row ----
    offs, off = [], 0
    for v in vocab_sizes:
        offs.append(off)
        off += v
    vpad = memb_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (b, vpad), 1)
    oh = jnp.zeros((b, vpad), jnp.float32)
    for f in range(nf):
        gid = tok_scr[:, f:f + 1] + offs[f]
        oh = oh + (lanes == gid).astype(jnp.float32)
    h0 = (jnp.dot(oh, memb_ref[...], preferred_element_type=jnp.float32)
          + binr_ref[...] + pe_ref[0])
    h_scr[...] = h0

    # ---- layer stack: nested pipeline over (L, batch chunks) ----
    # Per layer: the full-batch MXU matmuls (qkv at the first chunk;
    # attention-out + FFN at the last) run once; the chunks in between do
    # only the VPU state update on their streamed (bb, E, D) state block.
    # The (layer, chunk) position comes from an SMEM counter incremented by
    # the (sequential) pipeline body — (1,1) int32 index *blocks* would
    # violate Mosaic's 128-lane slice tiling.
    cnt_scr[0] = 0

    def inner(qkvb_ref, wob_ref, l1s_ref, l1b_ref,
              l2s_ref, l2b_ref, f1b_ref, f2b_ref, qkvw_ref, wow_ref,
              s_ref, z_ref, s_out_ref, z_out_ref):
        c = cnt_scr[0]
        l = c // n_bblk
        nb = c % n_bblk
        cnt_scr[0] = c + 1
        rows = pl.dslice(nb * bb, bb)

        if _ABLATE == "state":        # pipeline/DMA skeleton only
            s_out_ref[0] = s_ref[0]
            z_out_ref[0] = z_ref[0]
            return

        @pl.when(nb == 0)
        def _layer_head():
            pltpu.make_async_copy(f1w_hbm.at[l], f1_scr, sem1).start()
            pltpu.make_async_copy(f2w_hbm.at[l], f2_scr, sem2).start()
            # matmul inputs in the weights' dtype (bf16 runs the MXU at 4x
            # its f32 rate and matches the XLA decode path, whose h carries
            # the params dtype); accumulation stays f32
            qkv = jnp.dot(h_scr[...].astype(qkvw_ref.dtype), qkvw_ref[0],
                          preferred_element_type=jnp.float32) + qkvb_ref[0, 0]
            qkv_scr[...] = jnp.concatenate(
                [_phi(qkv[:, :2 * d]), qkv[:, 2 * d:]], axis=-1)

        if _ABLATE == "attn":         # matmuls + DMA, no chunk state math
            s_out_ref[0] = s_ref[0]
            z_out_ref[0] = z_ref[0]
        else:
            # one full-lane load then static slices (a dynamic-sublane +
            # offset-lane load would lower to an unsupported gather)
            qkv_rows = qkv_scr[rows, :]
            q = qkv_rows[:, :d]
            k = qkv_rows[:, d:2 * d]
            v = qkv_rows[:, 2 * d:]
            # expand_dims (pure reshape) instead of None-indexing: jnp's
            # newaxis-getitem lowers via gather, which Mosaic rejects
            # in-kernel
            ed = jnp.expand_dims
            upd = jnp.concatenate(
                [ed(k[:, i * e:(i + 1) * e], -1)
                 * ed(v[:, i * e:(i + 1) * e], 1)
                 for i in range(n_head)], axis=-1)        # (bb, E, D)
            # state may be stored sub-f32 (halves the dominant HBM
            # traffic); accumulate in f32, round only on store
            s_new = s_ref[0].astype(jnp.float32) + upd
            s_out_ref[0] = s_new.astype(s_out_ref.dtype)
            z_new = z_ref[0].astype(jnp.float32) + k
            z_out_ref[0] = z_new.astype(z_out_ref.dtype)
            zf_scr[rows, :] = z_new

            num_scr[rows, :] = jnp.concatenate(
                [jnp.sum(ed(q[:, i * e:(i + 1) * e], -1)
                         * s_new[:, :, i * e:(i + 1) * e], axis=1)
                 for i in range(n_head)], axis=-1)        # (bb, D)

        @pl.when(nb == n_bblk - 1)
        def _layer_tail():
            # den per head as a 64-lane reduce (same accumulation order as
            # the XLA decode_step and the v3/v4 kernels — a full-width
            # masked matmul sums in a different f32 order and flips greedy
            # near-ties), then exact broadcast back to D lanes via a 0/1
            # matmul (single nonzero per column).
            pq = qkv_scr[:, :d] * zf_scr[...]
            den_h = jnp.concatenate(
                [jnp.sum(pq[:, i * e:(i + 1) * e], axis=-1, keepdims=True)
                 for i in range(n_head)], axis=-1)         # (B, H)
            hi = jax.lax.broadcasted_iota(jnp.int32, (n_head, d), 0)
            hj = jax.lax.broadcasted_iota(jnp.int32, (n_head, d), 1) // e
            expand = (hi == hj).astype(jnp.float32)
            den = jnp.dot(den_h, expand,
                          preferred_element_type=jnp.float32)
            att = num_scr[...] / (den + eps)
            ao = jnp.dot(att.astype(wow_ref.dtype), wow_ref[0],
                         preferred_element_type=jnp.float32)
            h1 = _ln(h_scr[...] + ao + wob_ref[0, 0], l1s_ref[0, 0],
                     l1b_ref[0, 0])
            pltpu.make_async_copy(f1w_hbm.at[l], f1_scr, sem1).wait()
            pltpu.make_async_copy(f2w_hbm.at[l], f2_scr, sem2).wait()
            y = jnp.dot(h1.astype(f1_scr.dtype), f1_scr[...],
                        preferred_element_type=jnp.float32) + f1b_ref[0, 0]
            y = _gelu_exact(y)
            y = jnp.dot(y.astype(f2_scr.dtype), f2_scr[...],
                        preferred_element_type=jnp.float32) + f2b_ref[0, 0]
            h_scr[...] = _ln(h1 + y, l2s_ref[0, 0], l2b_ref[0, 0])

    L, nbk = n_layer, n_bblk
    di = f1_scr.shape[-1]
    small = lambda spec_shape, imap: pl.BlockSpec(spec_shape, imap)
    pipeline = pltpu.emit_pipeline(
        inner,
        grid=(L, nbk),
        in_specs=[
            small((1, 1, 3 * d), lambda l, nb: (l, 0, 0)),        # qkvb
            small((1, 1, d), lambda l, nb: (l, 0, 0)),            # wob
            small((1, 1, d), lambda l, nb: (l, 0, 0)),            # l1s
            small((1, 1, d), lambda l, nb: (l, 0, 0)),            # l1b
            small((1, 1, d), lambda l, nb: (l, 0, 0)),            # l2s
            small((1, 1, d), lambda l, nb: (l, 0, 0)),            # l2b
            small((1, 1, di), lambda l, nb: (l, 0, 0)),           # f1b
            small((1, 1, d), lambda l, nb: (l, 0, 0)),            # f2b
            small((1, d, 3 * d), lambda l, nb: (l, 0, 0)),        # qkvw
            small((1, d, d), lambda l, nb: (l, 0, 0)),            # wow
            # deep-buffered state stream: the head/tail chunks of each
            # layer stall on full-batch MXU matmuls (~50-150us); with only
            # 2 buffers those stalls serialize against the state DMA
            # (measured additive: 2783us skeleton + 1263us compute at
            # B=512).  buffer_count=4 + lookahead lets the DMA engines run
            # ahead across the layer boundary during the stalls.
            pl.BlockSpec((1, bb, e, d), lambda l, nb: (l, nb, 0, 0),
                         pipeline_mode=pl.Buffered(
                             buffer_count=4, use_lookahead=True)),   # s
            pl.BlockSpec((1, bb, d), lambda l, nb: (l, nb, 0),
                         pipeline_mode=pl.Buffered(
                             buffer_count=4, use_lookahead=True)),   # z
        ],
        out_specs=[
            small((1, bb, e, d), lambda l, nb: (l, nb, 0, 0)),
            small((1, bb, d), lambda l, nb: (l, nb, 0)),
        ],
    )
    pipeline(qkvb, wob, l1s, l1b, l2s, l2b, f1b, f2b,
             qkvw, wow, s_hbm, z_hbm, s_out_hbm, z_out_hbm)

    # ---- heads + in-kernel sampling on the (nf*B, VF_PAD) layout ----
    hf = _ln(h_scr[...], fls_ref[0], flb_ref[0])
    logits = jnp.dot(hf.astype(whp_ref.dtype), whp_ref[...],
                     preferred_element_type=jnp.float32) + bhp_ref[...]
    x = jnp.concatenate(
        [logits[:, f * VF_PAD:(f + 1) * VF_PAD] * (1.0 / temps[f])
         for f in range(nf)], axis=0)                     # (nf*B, VF_PAD)

    if greedy:
        tok_rows = argmax_first(x)                        # (nf*B, 1)
    else:
        m = jnp.max(x, axis=-1, keepdims=True)
        ex = jnp.exp(x - m)
        p = ex / (jnp.sum(ex, axis=-1, keepdims=True) * (1.0 + 1e-5))
        topp_col = jnp.concatenate(
            [jnp.full((b, 1), topps[f], jnp.float32) for f in range(nf)],
            axis=0)
        keep = nucleus_keep_by_threshold(p, topp_col)
        pltpu.prng_seed(seed_ref[0] + t * jnp.int32(2654435761 & 0x7FFFFFFF))
        bits = pltpu.prng_random_bits((nf * b, VF_PAD))
        g = gumbel_from_bits(pltpu.bitcast(bits, jnp.uint32))
        score = jnp.where(keep, x + g, NEG)
        tok_rows = argmax_first(score)

    tok = jnp.concatenate(
        [tok_rows[f * b:(f + 1) * b, :] for f in range(nf)],
        axis=-1).astype(jnp.int32)                        # (B, nf)
    tok_out_ref[0] = tok
    tok_scr[...] = tok


def fused_decode_v5(v5p: V5Params, tok0: jax.Array, s5: jax.Array,
                    z5: jax.Array, pe_rows: jax.Array, seed: jax.Array, *,
                    n_head: int, max_tokens: int, bb: int = 8,
                    vocab_sizes: Tuple[int, ...],
                    temps: Tuple[float, ...], topps: Tuple[float, ...],
                    greedy: bool = False, eps: float = DEFAULT_EPS):
    """Decode `max_tokens` tokens in one pallas_call.

    Contract: tok0 (B, nf) int32 is the next token TO BE FED — the kernel
    embeds it, updates the state with it, and emits its successor.  s5/z5
    is the packed state BEFORE tok0; pe_rows (T, D) f32 are the positional
    rows for the T fed tokens.  Returns (tokens (T, B, nf) int32, s5',
    z5'); the last emitted token is sampled but not yet fed."""
    b, nf = tok0.shape
    L, _, e, d = s5.shape
    di = v5p.f1w.shape[-1]
    T = max_tokens
    n_bblk = b // bb

    kernel = functools.partial(
        _v5_kernel, n_layer=L, n_head=n_head, d_head=e, bb=bb,
        vocab_sizes=tuple(vocab_sizes), temps=tuple(temps),
        topps=tuple(topps), greedy=greedy, eps=eps)

    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    tokens, s_out, z_out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((b, nf), lambda t: (0, 0)),          # tok0
            pl.BlockSpec((1, 1, d), lambda t: (t, 0, 0)),     # pe row
            pl.BlockSpec((v5p.memb.shape[0], d), lambda t: (0, 0)),
            pl.BlockSpec((1, d), lambda t: (0, 0)),           # binr
            pl.BlockSpec((d, nf * VF_PAD), lambda t: (0, 0)),  # whp
            pl.BlockSpec((1, nf * VF_PAD), lambda t: (0, 0)),  # bhp
            pl.BlockSpec((1, d), lambda t: (0, 0)),           # fls
            pl.BlockSpec((1, d), lambda t: (0, 0)),           # flb
            anyspec, anyspec, anyspec, anyspec, anyspec, anyspec,
            anyspec, anyspec,                                 # biases
            anyspec, anyspec, anyspec, anyspec,               # big weights
            anyspec, anyspec,                                 # s z
        ],
        out_specs=[
            pl.BlockSpec((1, b, nf), lambda t: (t, 0, 0)),
            anyspec, anyspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, b, nf), jnp.int32),
            jax.ShapeDtypeStruct(s5.shape, s5.dtype),
            jax.ShapeDtypeStruct(z5.shape, z5.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),                  # h
            pltpu.VMEM((b, nf), jnp.int32),                   # tok
            pltpu.VMEM((b, 3 * d), jnp.float32),              # phi(q)|phi(k)|v
            pltpu.VMEM((b, d), jnp.float32),                  # num
            pltpu.VMEM((b, d), jnp.float32),                  # z full
            pltpu.VMEM((d, di), v5p.f1w.dtype),               # f1
            pltpu.VMEM((di, d), v5p.f2w.dtype),               # f2
            pltpu.SMEM((1,), jnp.int32),                      # (l, nb) ctr
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases=(
            {} if os.environ.get("RLMG_V5_NOALIAS") == "1"
            else {21: 1, 22: 2}),
        # the 16MB scoped-VMEM default is what made B>=128 fail to compile
        # (the helper reports it as a bare subprocess crash); v5e has
        # 128MiB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(jnp.asarray([seed], jnp.int32).reshape(1,), tok0,
          pe_rows.reshape(pe_rows.shape[0], 1, -1),
          v5p.memb, v5p.binr, v5p.whp, v5p.bhp, v5p.fls, v5p.flb,
          v5p.qkvb, v5p.wob, v5p.l1s, v5p.l1b, v5p.l2s,
          v5p.l2b, v5p.f1b, v5p.f2b, v5p.qkvw, v5p.wow, v5p.f1w, v5p.f2w,
          s5, z5)
    return tokens, s_out, z_out
