"""Weight-RESIDENT persistent decode kernel v7: the latency path (r4).

The small-batch decode wall (BENCH.md r3 latency table) is weight
traffic: the v4 per-step path re-streams every weight from HBM for every
token — ~77 MB bf16 through a grid whose pure-copy rate measured
419 GB/s, i.e. ~184 us of the 284 us/step at B=1.  The v6 persistent
kernel can't fix this at small batch: it carries batch on the 128-lane
axis, so B<=8 pads 16x and its per-token STATE stream alone (~100 MB at
the padded B=128) costs more than v4's weights.

v7 removes the weight stream entirely for B<=16: at small batch the v4
pair-packed recurrent state (L, P, B, E, 2E) is only ~6 MB (bf16), so
ALL weights (~79 MB bf16) AND the state fit in VMEM (v5e: 128 MiB) for
the whole decode:

  * grid (T, L), both dims "arbitrary" (sequential); one program = one
    layer of one token step;
  * at (t=0, l=0) the big weights and the state are DMA'd HBM->VMEM
    once (~79 MB ~= 140 us, amortized over the T-token chunk); the
    state is written back once at (T-1, L-1);
  * per-token HBM traffic: one (1, D) pe row in, one (NF*B, 1) token
    row out — everything else lives in VMEM scratch;
  * the layer math is decode_kernel_v4's exactly (head-pair packing,
    128-lane state rows, block-diagonal denominator matmul), with the
    matmuls running at the weight dtype (bf16) like v6;
  * embedding, heads, and sampling run in-kernel in a field-stacked
    (NF*B, VF_PAD) batch-major layout: the per-field logits stack on
    SUBLANES (row f*B+b), so the nucleus bisection / Gumbel-argmax
    reduce over lanes and the sampled one-hot feeds the next token's
    embedding matmuls without ever extracting ids to sublane-mismatched
    layouts.

Same role as v4/v6: replaces the reference's per-token GPU->host->numpy
round trip (dqn_policy/testing-no-type-cp.py:126-179 + model.py:259-298)
and the fast_transformers recurrent CUDA path (model.py:141-150), here
specialized to the reference's actual serving scenario (5 songs, one at
a time — testing-no-type-cp.py:182-224).

Numerics: in-kernel accumulation f32 (preferred_element_type), matmul
inputs at the weight dtype, state stored at decode_state_dtype()
(accumulate f32, round on store — v4's contract).  Like v6 this is a
THROUGHPUT-EQUIVALENT stochastic path: bf16 MXU rounding means greedy
streams can diverge from the XLA path at near-ties, so greedy
generation stays pinned to the bit-stable path (generate_songs); with
f32 weights + f32 state the kernel is argmax-equivalent to the XLA scan
(tests/test_decode_kernel_v7.py).

MEASURED RESULT (r4, on-chip, fetch-closed timing — BENCH.md "Round-4
second pass"): v7 TIES v4 at B=1 (302 vs 305 us/step) and slightly
loses at B=8 (330 vs 300 us/step).  The premise above is FALSIFIED:
removing the entire per-token weight stream bought ~nothing, so v4's
small-batch step is NOT weight-traffic bound.  The shared ~300 us floor
is the serial per-token machinery itself — v7's grid (T, L) pays
12 sequential program launches per token (~7 us/program floor on this
chip = ~84 us) plus B=1 matvecs that use 1/128 of the MXU's rows.  The
kernel stays OPT-IN (latency_max_batch() defaults to 0); the next
latency lever is collapsing L into an in-kernel fori_loop (one program
per token) rather than weight residency.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only hosts
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from ..decode_kernel_v3 import _gelu_exact, _ln, _phi
from ..decode_common import NEG, VF_PAD, gumbel_from_bits
from ..linear_attention import DEFAULT_EPS
# shared resident-layout packing + sampling helpers live in the
# v8 module (quarantined here after the r5 negative A/B); v7 keeps its
# public names as aliases
from .decode_kernel_v8 import (
    ResidentParams, make_resident_params, pack_state_pair,
    unpack_state_pair, _argmax_first_lane, _nucleus_keep_lane, _field_col)

V7Params = ResidentParams
make_v7_params = make_resident_params


def _v7_kernel(seed_ref, oh0_ref, pe_ref, memb_ref, binr_ref, whp_ref,
               bhp_ref, qkvb_ref, wob_ref, ln1s_ref, ln1b_ref, ln2s_ref,
               ln2b_ref, f1b_ref, f2b_ref, fls_ref, flb_ref,
               qkvw_hbm, wow_hbm, f1w_hbm, f2w_hbm, s_hbm, z_hbm,
               tok_out_ref, s_out_hbm, z_out_hbm,
               h_scr, oh_scr, qkvw_scr, wow_scr, f1w_scr, f2w_scr,
               s_scr, z_scr, sems,
               *, n_layer: int, n_pair: int, d_head: int, n_tok: int,
               vocab_sizes: Tuple[int, ...], temps: Tuple[float, ...],
               topps: Tuple[float, ...], greedy: bool, eps: float):
    t = pl.program_id(0)
    l = pl.program_id(1)
    b, d = h_scr.shape
    e = d_head
    nf = len(vocab_sizes)

    @pl.when(jnp.logical_and(t == 0, l == 0))
    def _load_resident():
        pairs = ((qkvw_hbm, qkvw_scr), (wow_hbm, wow_scr),
                 (f1w_hbm, f1w_scr), (f2w_hbm, f2w_scr),
                 (s_hbm, s_scr), (z_hbm, z_scr))
        for i, (src, dst) in enumerate(pairs):
            pltpu.make_async_copy(src, dst, sems.at[i]).start()
        for i, (src, dst) in enumerate(pairs):
            pltpu.make_async_copy(src, dst, sems.at[i]).wait()
        oh_scr[...] = oh0_ref[...]

    @pl.when(l == 0)
    def _embed():
        # h0 = sum_f onehot_f @ memb_f  (+ in_linear bias + pe row)
        acc = jnp.zeros((b, d), jnp.float32)
        for f in range(nf):
            ohf = oh_scr[f * b:(f + 1) * b, :].astype(memb_ref.dtype)
            acc += jnp.dot(ohf, memb_ref[f * VF_PAD:(f + 1) * VF_PAD, :],
                           preferred_element_type=jnp.float32)
        h_scr[...] = acc + binr_ref[...] + pe_ref[0, 0:1, :]

    # ---- one layer, decode_kernel_v4 math with resident weights ----
    h = h_scr[...]
    hb = h.astype(qkvw_scr.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * e, 2 * e), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2 * e, 2 * e), 1)
    blockdiag = ((lane < e) == (lane2 < e)).astype(jnp.float32)
    ao = jnp.zeros((b, d), jnp.float32)
    for p in range(n_pair):
        qkv = jnp.dot(hb, qkvw_scr[l, p],
                      preferred_element_type=jnp.float32) + qkvb_ref[l, p, 0]
        q01 = _phi(qkv[:, :2 * e])
        k01 = _phi(qkv[:, 2 * e:4 * e])
        v01 = qkv[:, 4 * e:]
        k0, k1 = k01[:, :e], k01[:, e:]
        v0, v1 = v01[:, :e], v01[:, e:]
        s_new = s_scr[l, p].astype(jnp.float32) + jnp.concatenate(
            [k0[:, :, None] * v0[:, None, :],
             k1[:, :, None] * v1[:, None, :]], axis=-1)     # (B, E, 2E)
        s_scr[l, p] = s_new.astype(s_scr.dtype)
        z_new = z_scr[l, p].astype(jnp.float32) + k01
        z_scr[l, p] = z_new.astype(z_scr.dtype)
        q0, q1 = q01[:, :e], q01[:, e:]
        num = jnp.concatenate(
            [jnp.sum(q0[:, :, None] * s_new[:, :, :e], axis=1),
             jnp.sum(q1[:, :, None] * s_new[:, :, e:], axis=1)], axis=-1)
        den = jnp.dot(q01 * z_new, blockdiag,
                      preferred_element_type=jnp.float32)
        att01 = (num / (den + eps)).astype(wow_scr.dtype)
        ao += jnp.dot(att01, wow_scr[l, p],
                      preferred_element_type=jnp.float32)
    h1 = _ln(h + ao + wob_ref[l, 0], ln1s_ref[l, 0], ln1b_ref[l, 0])
    y = jnp.dot(h1.astype(f1w_scr.dtype), f1w_scr[l],
                preferred_element_type=jnp.float32) + f1b_ref[l, 0]
    y = _gelu_exact(y)
    y = jnp.dot(y.astype(f2w_scr.dtype), f2w_scr[l],
                preferred_element_type=jnp.float32) + f2b_ref[l, 0]
    h2 = _ln(h1 + y, ln2s_ref[l, 0], ln2b_ref[l, 0])
    h_scr[...] = h2

    @pl.when(l == n_layer - 1)
    def _heads_and_sample():
        hf = _ln(h2, fls_ref[0], flb_ref[0]).astype(whp_ref.dtype)
        rows = []
        for f in range(nf):
            rows.append(jnp.dot(hf, whp_ref[:, f * VF_PAD:(f + 1) * VF_PAD],
                                preferred_element_type=jnp.float32)
                        + bhp_ref[f:f + 1, :])
        x = jnp.concatenate(rows, axis=0)                   # (NF*B, V)
        x = x * _field_col(nf, b, [1.0 / tt for tt in temps])
        if greedy:
            ids = _argmax_first_lane(x)
        else:
            m = jnp.max(x, axis=1, keepdims=True)
            ex = jnp.exp(x - m)
            prob = ex / (jnp.sum(ex, axis=1, keepdims=True) * (1.0 + 1e-5))
            keep = _nucleus_keep_lane(prob, _field_col(nf, b, topps))
            pltpu.prng_seed(seed_ref[0]
                            + t * jnp.int32(2654435761 & 0x7FFFFFFF))
            bits = pltpu.prng_random_bits((nf * b, VF_PAD))
            g = gumbel_from_bits(pltpu.bitcast(bits, jnp.uint32))
            ids = _argmax_first_lane(jnp.where(keep, x + g, NEG))
        tok_out_ref[0] = ids                                # (NF*B, 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (nf * b, VF_PAD), 1)
        oh_scr[...] = (iota_l == ids).astype(jnp.float32)

        @pl.when(t == n_tok - 1)
        def _flush_state():
            pltpu.make_async_copy(s_scr, s_out_hbm, sems.at[0]).start()
            pltpu.make_async_copy(z_scr, z_out_hbm, sems.at[1]).start()
            pltpu.make_async_copy(s_scr, s_out_hbm, sems.at[0]).wait()
            pltpu.make_async_copy(z_scr, z_out_hbm, sems.at[1]).wait()


def fused_decode_v7(v7p: V7Params, tok0T: jax.Array, s4: jax.Array,
                    z4: jax.Array, t0, seed: jax.Array, *,
                    n_head: int, max_tokens: int,
                    vocab_sizes: Tuple[int, ...],
                    temps: Tuple[float, ...], topps: Tuple[float, ...],
                    greedy: bool = False, eps: float = DEFAULT_EPS,
                    interpret: bool = False):
    """Decode `max_tokens` tokens in one weight-resident pallas_call.

    Same contract as decode_kernel_v6.fused_decode_v6: tok0T (nf, B)
    int32 is the next token TO BE FED (the kernel embeds it, updates the
    state, emits its successor); s4/z4 (v4 pair layout, see
    pack_state_pair) is the state BEFORE tok0T; t0 is tok0T's position.
    Returns (tokensT (T, nf, B) int32, s4', z4') where the last emitted
    token has been sampled but not fed — pass it as the next chunk's
    tok0T.  B must be a multiple of 8 and small enough that weights +
    state fit VMEM (B<=16 at the flagship size)."""
    nf, b = tok0T.shape
    L, P, _, e, _ = s4.shape
    d = v7p.wob.shape[-1]
    T = max_tokens
    # fail loudly BEFORE the pallas_call when the resident set cannot fit:
    # on the tunneled platform a VMEM overflow surfaces as a SILENT
    # compile-helper crash (memory: axon-tpu-platform-quirks), which costs
    # hours to attribute.  Budget mirrors compiler_params
    # vmem_limit_bytes=110MB below.
    resident = (sum(int(a.size) * a.dtype.itemsize
                    for a in (v7p.qkvw, v7p.wow, v7p.f1w, v7p.f2w))
                + (int(s4.size) + int(z4.size)) * s4.dtype.itemsize
                + 2 * nf * b * VF_PAD * 4        # onehot scratch + oh0
                + b * d * 4)                     # h scratch
    if not interpret and resident > 100 << 20:
        raise ValueError(
            f"decode_kernel_v7 resident set ~{resident >> 20} MiB exceeds "
            f"the 100 MiB VMEM budget at B={b} — the weight-resident "
            f"latency kernel only serves small batches (B<=16 at the "
            f"flagship size); route larger batches to the v6 persistent "
            f"or v4 per-step path (generate_songs auto-dispatch does)")
    pe_rows = jax.lax.dynamic_slice_in_dim(v7p.pe, t0, T, axis=0)  # (T, D)
    # Mosaic requires the last two block dims divisible by (8, 128) or
    # equal to the array dims — a (1, D) per-row block over (T, D) is
    # rejected on real TPU (interpret mode doesn't enforce it).  Same
    # trick as decode_kernel_v6's (T, D, 128) pe slab, batch-major: ship
    # (T, 8, D) with the row replicated across the 8-sublane tile and a
    # legal (1, 8, D) block per step.
    pe_slab = jnp.broadcast_to(pe_rows[:, None, :], (T, 8, d))
    oh0 = jax.nn.one_hot(tok0T.reshape(nf * b), VF_PAD,
                         dtype=jnp.float32)                 # (NF*B, V)

    kernel = functools.partial(
        _v7_kernel, n_layer=L, n_pair=P, d_head=e, n_tok=T,
        vocab_sizes=tuple(vocab_sizes), temps=tuple(temps),
        topps=tuple(topps), greedy=greedy, eps=eps)

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    const = lambda shp: pl.BlockSpec(shp, lambda t, l: (0,) * len(shp))
    di = v7p.f1w.shape[-1]
    wdt = v7p.qkvw.dtype
    sdt = s4.dtype

    tok_out, s_out, z_out = pl.pallas_call(
        kernel,
        grid=(T, L),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM) if pltpu else None,  # seed
            const((nf * b, VF_PAD)),                        # oh0
            pl.BlockSpec((1, 8, d), lambda t, l: (t, 0, 0)),  # pe slab row
            const((nf * VF_PAD, d)),                        # memb
            const((1, d)),                                  # binr
            const((d, nf * VF_PAD)),                        # whp
            const((nf, VF_PAD)),                            # bhp
            const((L, P, 1, 6 * e)),                        # qkvb
            const((L, 1, d)),                               # wob
            const((L, 1, d)), const((L, 1, d)),             # ln1s ln1b
            const((L, 1, d)), const((L, 1, d)),             # ln2s ln2b
            const((L, 1, di)),                              # f1b
            const((L, 1, d)),                               # f2b
            const((1, d)), const((1, d)),                   # fls flb
            anyspec, anyspec, anyspec, anyspec,             # big weights
            anyspec, anyspec,                               # s z
        ],
        out_specs=[
            pl.BlockSpec((1, nf * b, 1), lambda t, l: (t, 0, 0)),
            anyspec, anyspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, nf * b, 1), jnp.int32),
            jax.ShapeDtypeStruct(s4.shape, sdt),
            jax.ShapeDtypeStruct(z4.shape, sdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),                # h
            pltpu.VMEM((nf * b, VF_PAD), jnp.float32),      # onehot feedback
            pltpu.VMEM(v7p.qkvw.shape, wdt),                # qkvw resident
            pltpu.VMEM(v7p.wow.shape, wdt),                 # wow
            pltpu.VMEM(v7p.f1w.shape, wdt),                 # f1w
            pltpu.VMEM(v7p.f2w.shape, wdt),                 # f2w
            pltpu.VMEM(s4.shape, sdt),                      # state S
            pltpu.VMEM(z4.shape, sdt),                      # state z
            pltpu.SemaphoreType.DMA((6,)),
        ] if pltpu else [],
        input_output_aliases={21: 1, 22: 2},
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 << 20) if (pltpu and not interpret)
            else None),
    )(jnp.asarray([seed], jnp.int32).reshape(1,), oh0, pe_slab,
      v7p.memb, v7p.binr, v7p.whp, v7p.bhp, v7p.qkvb, v7p.wob,
      v7p.ln1s, v7p.ln1b, v7p.ln2s, v7p.ln2b, v7p.f1b, v7p.f2b,
      v7p.fls, v7p.flb, v7p.qkvw, v7p.wow, v7p.f1w, v7p.f2w, s4, z4)
    # (T, NF*B, 1) ids -> (T, NF, B) to match the v6 piece format
    tokensT = tok_out.reshape(T, nf, b)
    return tokensT, s_out, z_out
