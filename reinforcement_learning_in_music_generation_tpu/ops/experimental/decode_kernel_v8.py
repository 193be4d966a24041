"""One-program-per-token latency decode kernel v8 (r5) — NEGATIVE RESULT.

Quarantined to ops/experimental after the r5 on-chip A/B (BENCH.md r5):
v8 measured 465 us/step at B=1 (2,149 tok/s) vs v7's 449 us and v4's
329 us (3,040 tok/s); at B=8 it was 467 us vs v4's 325 us.  Collapsing
the 12 per-layer grid programs into ONE program per token did not move
the needle vs v7 (within 4%) and LOST ~40% to v4 — which falsifies the
launch-overhead hypothesis the same way v7 falsified the weight-traffic
one.  The remaining decomposition: v4's per-layer kernels let Mosaic
double-buffer each layer's weight DMA across grid steps and let XLA
overlap the sampling glue with kernel dispatch, while v8's in-kernel
`fori_loop` serializes DMA-wait -> compute per layer slab with no
cross-layer overlap.  B=1 decode is compute/feedback-latency bound at
~330 us/step on this chip; v4 stays the latency dispatch.

Opt-in via RLMG_LATENCY_KERNEL=v8 (sampler latency family); default
auto-dispatch keeps latency_max_batch() = 0.


The r4 A/B falsified the weight-traffic hypothesis for the small-batch
decode wall: the weight-resident v7 kernel (grid (T, L), one program per
layer per token) TIED v4 at B=1 (~300 us/step, BENCH.md r4 second pass).
The measured floor decomposition pointed at the serial per-token
machinery itself: 12 sequential grid programs per token (~7 us/program
on this chip = ~84 us) plus XLA glue, not HBM bandwidth.

v8 is the named next lever (VERDICT r4 next #1): collapse the layer grid
dimension into an in-kernel `fori_loop` over layer slabs so each token
costs ONE grid program:

  * grid (T,) ("arbitrary" = sequential); one program = one full token:
    embed -> fori_loop over L layer slabs -> final LN -> 6 heads ->
    in-kernel sampling -> one-hot feedback for the next token;
  * all weights + the pair-packed state are VMEM-resident for the whole
    chunk exactly as v7 (loaded once at t==0, state flushed once at
    t==T-1) — residency was NOT the bottleneck but it is free here and
    keeps per-token HBM traffic at one (8, D) pe row in + one
    (NF*B, 1) token row out;
  * the layer body indexes the resident weight scratches with the
    traced layer index (leading, untiled dims — legal dynamic slicing),
    so per-layer temporaries are REUSED across iterations instead of
    unrolled; the earlier fully-unrolled formulation blew Mosaic's
    scoped-VMEM stack allocator (~27 MB of per-head temporaries,
    BENCH.md "Platform findings").

Layer math, layouts, and sampling are decode_kernel_v4/v7's exactly
(head-pair packing, 128-lane state rows, block-diagonal denominator
matmul, field-stacked (NF*B, VF_PAD) logit rows, sort-free nucleus
bisection + on-core Gumbel argmax), so the numerics contract carries
over: f32 weights + f32 state are argmax-equivalent to the XLA scan
(tests/test_decode_kernel_v8.py); bf16 is a throughput-equivalent
stochastic path and greedy generation stays pinned to the bit-stable
XLA path.

Role: replaces the reference's per-token GPU->host->numpy round trip
(dqn_policy/testing-no-type-cp.py:126-179 + model.py:259-298) for its
actual operating point — one song at a time, 50 bars
(testing-no-type-cp.py:182-224) — where B=1 leaves the batch axis
unable to amortize anything and per-token overhead IS the wall.
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
from ..decode_kernel_v4 import make_v4_params
from ..linear_attention import DEFAULT_EPS


class ResidentParams(NamedTuple):
    """Weight-resident decode layout shared by v7 (experimental) and v8:
    v4's pair-packed per-layer slabs plus pre-fused embedding/head mats."""
    qkvw: jax.Array   # (L, P, D, 6E) wdtype, cols [q0|q1|k0|k1|v0|v1]
    qkvb: jax.Array   # (L, P, 1, 6E) f32
    wow: jax.Array    # (L, P, 2E, D) wdtype
    wob: jax.Array    # (L, 1, D) f32
    ln1s: jax.Array   # (L, 1, D) f32
    ln1b: jax.Array
    ln2s: jax.Array
    ln2b: jax.Array
    f1w: jax.Array    # (L, D, DI) wdtype
    f1b: jax.Array    # (L, 1, DI) f32
    f2w: jax.Array    # (L, DI, D) wdtype
    f2b: jax.Array    # (L, 1, D) f32
    memb: jax.Array   # (NF*VF_PAD, D) wdtype: row f*VF_PAD+v =
    #                 #   emb_f[v]*sqrt(de_f) @ in_linear[off_f:off_f+de_f]
    binr: jax.Array   # (1, D) f32 in_linear bias
    whp: jax.Array    # (D, NF*VF_PAD) wdtype head weights, field-strided
    bhp: jax.Array    # (NF, VF_PAD) f32 head biases, NEG at padding
    fls: jax.Array    # (1, D) f32 final-LN scale
    flb: jax.Array    # (1, D) f32
    pe: jax.Array     # (max_len, D) f32 sinusoidal rows


def make_resident_params(params: dict, cfg, pe_table, dtype=jnp.bfloat16
                         ) -> ResidentParams:
    from ...models import common as cm
    f32 = jnp.float32
    v4p = make_v4_params(params, cfg, dtype=dtype)

    names = cm.field_names(cfg.n_fields)
    d = cfg.d_model
    win = params["in_linear"]["w"].astype(f32)
    memb = jnp.zeros((cfg.n_fields * VF_PAD, d), f32)
    off = 0
    for f, (n, de) in enumerate(zip(names, cfg.emb_sizes)):
        tbl = params["emb"][n].astype(f32) * math.sqrt(de)
        memb = memb.at[f * VF_PAD:f * VF_PAD + tbl.shape[0]].set(
            tbl @ win[off:off + de])
        off += de

    whp = jnp.zeros((d, cfg.n_fields * VF_PAD), f32)
    bhp = jnp.full((cfg.n_fields, VF_PAD), NEG, f32)
    for f, (n, v) in enumerate(zip(names, cfg.vocab_sizes)):
        whp = whp.at[:, f * VF_PAD:f * VF_PAD + v].set(
            params["heads"][n]["w"].astype(f32))
        bhp = bhp.at[f, :v].set(params["heads"][n]["b"].astype(f32))

    return ResidentParams(
        qkvw=v4p["qkvw"], qkvb=v4p["qkvb"], wow=v4p["wow"], wob=v4p["wob"],
        ln1s=v4p["ln1s"], ln1b=v4p["ln1b"],
        ln2s=v4p["ln2s"], ln2b=v4p["ln2b"],
        f1w=v4p["f1w"], f1b=v4p["f1b"], f2w=v4p["f2w"], f2b=v4p["f2b"],
        memb=memb.astype(dtype),
        binr=params["in_linear"]["b"].astype(f32)[None, :],
        whp=whp.astype(dtype), bhp=bhp,
        fls=params["final_ln"]["scale"].astype(f32)[None, :],
        flb=params["final_ln"]["bias"].astype(f32)[None, :],
        pe=pe_table.astype(f32))


def pack_state_pair(s: jax.Array, z: jax.Array):
    """DecodeState (L,B,H,E,E),(L,B,H,E) -> v4 pair layout
    (L,P,B,E,2E),(L,P,B,2E) with lanes [head 2p | head 2p+1]."""
    L, b, h, e, _ = s.shape
    P = h // 2
    s4 = (s.transpose(0, 2, 1, 3, 4).reshape(L, P, 2, b, e, e)
          .transpose(0, 1, 3, 4, 2, 5).reshape(L, P, b, e, 2 * e))
    z4 = (z.transpose(0, 2, 1, 3).reshape(L, P, 2, b, e)
          .transpose(0, 1, 3, 2, 4).reshape(L, P, b, 2 * e))
    return s4, z4


def unpack_state_pair(s4: jax.Array, z4: jax.Array):
    L, P, b, e, _ = s4.shape
    s = (s4.reshape(L, P, b, e, 2, e).transpose(0, 1, 4, 2, 3, 5)
         .reshape(L, P * 2, b, e, e).transpose(0, 2, 1, 3, 4))
    z = (z4.reshape(L, P, b, 2, e).transpose(0, 1, 3, 2, 4)
         .reshape(L, P * 2, b, e).transpose(0, 2, 1, 3))
    return s, z


def _argmax_first_lane(x: jax.Array) -> jax.Array:
    """First-maximal index over the lane axis of (R, V) -> (R, 1) int32."""
    m = jnp.max(x, axis=1, keepdims=True)
    v = x.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.min(jnp.where(x == m, iota, v), axis=1, keepdims=True)


def _nucleus_keep_lane(p: jax.Array, top_p: jax.Array, iters: int = 24
                       ) -> jax.Array:
    """Sort-free nucleus keep-mask over the lane axis of (R, V); same
    bisection as decode_kernel_v6.nucleus_keep_sub."""
    lo = jnp.zeros_like(p[:, :1])
    hi = jnp.ones_like(p[:, :1])

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(p > mid, p, 0.0), axis=1, keepdims=True)
        pred = mass > top_p
        return jnp.where(pred, mid, lo), jnp.where(pred, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return p > lo


def _field_col(nf: int, b: int, values) -> jax.Array:
    """(NF*B, 1) f32 column holding values[f] on rows f*B..(f+1)*B-1."""
    frow = jax.lax.broadcasted_iota(jnp.int32, (nf * b, 1), 0) // b
    out = jnp.zeros((nf * b, 1), jnp.float32)
    for f in range(nf):
        out = jnp.where(frow == f, jnp.float32(values[f]), out)
    return out


def _v8_kernel(seed_ref, oh0_ref, pe_ref, memb_ref, binr_ref, whp_ref,
               bhp_ref, qkvb_ref, wob_ref, ln1s_ref, ln1b_ref, ln2s_ref,
               ln2b_ref, f1b_ref, f2b_ref, fls_ref, flb_ref,
               qkvw_hbm, wow_hbm, f1w_hbm, f2w_hbm, s_hbm, z_hbm,
               tok_out_ref, s_out_hbm, z_out_hbm,
               oh_scr, qkvw_scr, wow_scr, f1w_scr, f2w_scr,
               s_scr, z_scr, sems,
               *, n_layer: int, n_pair: int, d_head: int, n_tok: int,
               batch: int, vocab_sizes: Tuple[int, ...],
               temps: Tuple[float, ...], topps: Tuple[float, ...],
               greedy: bool, eps: float):
    t = pl.program_id(0)
    b = batch
    d = binr_ref.shape[-1]
    e = d_head
    nf = len(vocab_sizes)

    @pl.when(t == 0)
    def _load_resident():
        pairs = ((qkvw_hbm, qkvw_scr), (wow_hbm, wow_scr),
                 (f1w_hbm, f1w_scr), (f2w_hbm, f2w_scr),
                 (s_hbm, s_scr), (z_hbm, z_scr))
        for i, (src, dst) in enumerate(pairs):
            pltpu.make_async_copy(src, dst, sems.at[i]).start()
        for i, (src, dst) in enumerate(pairs):
            pltpu.make_async_copy(src, dst, sems.at[i]).wait()
        oh_scr[...] = oh0_ref[...]

    # ---- embed: h0 = sum_f onehot_f @ memb_f (+ in_linear bias + pe) ----
    acc = jnp.zeros((b, d), jnp.float32)
    for f in range(nf):
        ohf = oh_scr[f * b:(f + 1) * b, :].astype(memb_ref.dtype)
        acc += jnp.dot(ohf, memb_ref[f * VF_PAD:(f + 1) * VF_PAD, :],
                       preferred_element_type=jnp.float32)
    h0 = acc + binr_ref[...] + pe_ref[0, 0:1, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * e, 2 * e), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2 * e, 2 * e), 1)
    blockdiag = ((lane < e) == (lane2 < e)).astype(jnp.float32)

    # ---- fori_loop over layer slabs: decode_kernel_v4 math, resident
    # weights dynamically sliced at the traced layer index (leading,
    # untiled dims), per-layer temporaries reused across iterations ----
    def layer_body(l, h):
        hb = h.astype(qkvw_scr.dtype)
        ao = jnp.zeros((b, d), jnp.float32)
        for p in range(n_pair):
            qkv = jnp.dot(hb, qkvw_scr[l, p],
                          preferred_element_type=jnp.float32
                          ) + qkvb_ref[l, p, 0]
            q01 = _phi(qkv[:, :2 * e])
            k01 = _phi(qkv[:, 2 * e:4 * e])
            v01 = qkv[:, 4 * e:]
            k0, k1 = k01[:, :e], k01[:, e:]
            v0, v1 = v01[:, :e], v01[:, e:]
            s_new = s_scr[l, p].astype(jnp.float32) + jnp.concatenate(
                [k0[:, :, None] * v0[:, None, :],
                 k1[:, :, None] * v1[:, None, :]], axis=-1)   # (B, E, 2E)
            s_scr[l, p] = s_new.astype(s_scr.dtype)
            z_new = z_scr[l, p].astype(jnp.float32) + k01
            z_scr[l, p] = z_new.astype(z_scr.dtype)
            q0, q1 = q01[:, :e], q01[:, e:]
            num = jnp.concatenate(
                [jnp.sum(q0[:, :, None] * s_new[:, :, :e], axis=1),
                 jnp.sum(q1[:, :, None] * s_new[:, :, e:], axis=1)],
                axis=-1)
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
        return _ln(h1 + y, ln2s_ref[l, 0], ln2b_ref[l, 0])

    h2 = jax.lax.fori_loop(0, n_layer, layer_body, h0)

    # ---- final LN, 6 heads, in-kernel sampling, one-hot feedback ----
    hf = _ln(h2, fls_ref[0], flb_ref[0]).astype(whp_ref.dtype)
    rows = []
    for f in range(nf):
        rows.append(jnp.dot(hf, whp_ref[:, f * VF_PAD:(f + 1) * VF_PAD],
                            preferred_element_type=jnp.float32)
                    + bhp_ref[f:f + 1, :])
    x = jnp.concatenate(rows, axis=0)                       # (NF*B, V)
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
    tok_out_ref[0] = ids                                    # (NF*B, 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (nf * b, VF_PAD), 1)
    oh_scr[...] = (iota_l == ids).astype(jnp.float32)

    @pl.when(t == n_tok - 1)
    def _flush_state():
        pltpu.make_async_copy(s_scr, s_out_hbm, sems.at[0]).start()
        pltpu.make_async_copy(z_scr, z_out_hbm, sems.at[1]).start()
        pltpu.make_async_copy(s_scr, s_out_hbm, sems.at[0]).wait()
        pltpu.make_async_copy(z_scr, z_out_hbm, sems.at[1]).wait()


def fused_decode_v8(rp: ResidentParams, tok0T: jax.Array, s4: jax.Array,
                    z4: jax.Array, t0, seed: jax.Array, *,
                    n_head: int, max_tokens: int,
                    vocab_sizes: Tuple[int, ...],
                    temps: Tuple[float, ...], topps: Tuple[float, ...],
                    greedy: bool = False, eps: float = DEFAULT_EPS,
                    interpret: bool = False):
    """Decode `max_tokens` tokens, one grid program per token.

    Same contract as decode_kernel_v6.fused_decode_v6 /
    experimental.decode_kernel_v7.fused_decode_v7: tok0T (nf, B) int32 is
    the next token TO BE FED (the kernel embeds it, updates the state,
    emits its successor); s4/z4 (v4 pair layout, see pack_state_pair) is
    the state BEFORE tok0T; t0 is tok0T's position.  Returns
    (tokensT (T, nf, B) int32, s4', z4') where the last emitted token has
    been sampled but not fed — pass it as the next chunk's tok0T.  B must
    be a multiple of 8 and small enough that weights + state fit VMEM
    (B<=16 at the flagship size)."""
    nf, b = tok0T.shape
    L, P, _, e, _ = s4.shape
    d = rp.wob.shape[-1]
    T = max_tokens
    # fail loudly BEFORE the pallas_call when the resident set cannot fit:
    # on the tunneled platform a VMEM overflow surfaces as a SILENT
    # compile-helper crash (memory: axon-tpu-platform-quirks).  Budget
    # mirrors compiler_params vmem_limit_bytes=110MB below.
    resident = (sum(int(a.size) * a.dtype.itemsize
                    for a in (rp.qkvw, rp.wow, rp.f1w, rp.f2w))
                + (int(s4.size) + int(z4.size)) * s4.dtype.itemsize
                + 2 * nf * b * VF_PAD * 4        # onehot scratch + oh0
                + b * d * 4)                     # h live value
    if not interpret and resident > 100 << 20:
        raise ValueError(
            f"decode_kernel_v8 resident set ~{resident >> 20} MiB exceeds "
            f"the 100 MiB VMEM budget at B={b} — the latency kernel only "
            f"serves small batches (B<=16 at the flagship size); route "
            f"larger batches to the v6 persistent or v4 per-step path "
            f"(generate_songs auto-dispatch does)")
    pe_rows = jax.lax.dynamic_slice_in_dim(rp.pe, t0, T, axis=0)  # (T, D)
    # Mosaic block rule: a (1, D) per-row block over (T, D) is rejected on
    # real TPU (the v7 r4 lesson; interpret mode doesn't enforce it) —
    # ship (T, 8, D) with the row replicated across the 8-sublane tile
    # and a legal (1, 8, D) block per step.
    pe_slab = jnp.broadcast_to(pe_rows[:, None, :], (T, 8, d))
    oh0 = jax.nn.one_hot(tok0T.reshape(nf * b), VF_PAD,
                         dtype=jnp.float32)                 # (NF*B, V)

    kernel = functools.partial(
        _v8_kernel, n_layer=L, n_pair=P, d_head=e, n_tok=T, batch=b,
        vocab_sizes=tuple(vocab_sizes), temps=tuple(temps),
        topps=tuple(topps), greedy=greedy, eps=eps)

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    const = lambda shp: pl.BlockSpec(shp, lambda t: (0,) * len(shp))
    di = rp.f1w.shape[-1]
    wdt = rp.qkvw.dtype
    sdt = s4.dtype

    tok_out, s_out, z_out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM) if pltpu else None,  # seed
            const((nf * b, VF_PAD)),                        # oh0
            pl.BlockSpec((1, 8, d), lambda t: (t, 0, 0)),   # pe slab row
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
            pl.BlockSpec((1, nf * b, 1), lambda t: (t, 0, 0)),
            anyspec, anyspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, nf * b, 1), jnp.int32),
            jax.ShapeDtypeStruct(s4.shape, sdt),
            jax.ShapeDtypeStruct(z4.shape, sdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((nf * b, VF_PAD), jnp.float32),      # onehot feedback
            pltpu.VMEM(rp.qkvw.shape, wdt),                 # qkvw resident
            pltpu.VMEM(rp.wow.shape, wdt),                  # wow
            pltpu.VMEM(rp.f1w.shape, wdt),                  # f1w
            pltpu.VMEM(rp.f2w.shape, wdt),                  # f2w
            pltpu.VMEM(s4.shape, sdt),                      # state S
            pltpu.VMEM(z4.shape, sdt),                      # state z
            pltpu.SemaphoreType.DMA((6,)),
        ] if pltpu else [],
        input_output_aliases={21: 1, 22: 2},
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 << 20) if (pltpu and not interpret)
            else None),
    )(jnp.asarray([seed], jnp.int32).reshape(1,), oh0, pe_slab,
      rp.memb, rp.binr, rp.whp, rp.bhp, rp.qkvb, rp.wob,
      rp.ln1s, rp.ln1b, rp.ln2s, rp.ln2b, rp.f1b, rp.f2b,
      rp.fls, rp.flb, rp.qkvw, rp.wow, rp.f1w, rp.f2w, s4, z4)
    # (T, NF*B, 1) ids -> (T, NF, B) to match the v6 piece format
    tokensT = tok_out.reshape(T, nf, b)
    return tokensT, s_out, z_out
