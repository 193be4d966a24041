"""Whole-decode-step fused Pallas kernel (v3).

The scan decode path (models/linear_transformer.py:decode_step) is
per-op-overhead bound on TPU: ~15 small XLA ops per layer x 12 layers
~= 800 us/step at batch 32, while the HBM speed-of-light for the same
work is ~200 us (scripts/profile_decode.py).  v1/v2 of the fused kernel
(ops/decode_kernel.py) fused one *layer* per call and overflowed Mosaic's
scoped VMEM (~27MB/~23MB vs 16MB) because every head's f32 state and the
whole FFN sat in VMEM at once.

v3 fuses the ENTIRE 12-layer step into ONE pallas_call with grid (L, H):

  * program (l, h) updates one head's augmented state block
    (B, E, E+1) f32 — ~0.5 MB in VMEM instead of all 8 heads x 12 layers;
  * the hidden vector h lives in a (B, D) f32 VMEM scratch carried across
    all grid programs (TPU grids run sequentially);
  * per-head attention outputs accumulate into an (B, D) f32 scratch via
    att_h @ wo_h;
  * the FFN + both layernorms run on the last head program of each layer
    (pl.when), with the layer's FFN weights fetched once per layer (their
    block index doesn't change across that layer's head programs, so
    Mosaic skips the re-DMA);
  * gelu uses an Abramowitz-Stegun 7.1.26 erf polynomial (|eps|<=1.5e-7,
    i.e. f32-exact), matching the reference's exact gelu — Mosaic has no
    erf primitive.

Replaces the hot loop of dqn_policy/model.py:141-150,236-298 (the
fast_transformers recurrent decoder).

PRODUCTION ROLE (r4): v3 stays in production `ops/` for two reasons —
(1) it is the fused per-step fallback for ODD head counts: v4's head-pair
packing requires n_head % 2 == 0 (generate/sampler.py dispatches v4 when
even, v3 otherwise); (2) it hosts the shared Mosaic-safe kernel helpers
(_phi, _ln, _erf, _gelu_exact) imported by decode_kernel_v4/_v6 and
ffn_block.  The superseded experiments (v1/v2 per-layer, v5 persistent)
live in ops/experimental/ with their negative results documented.
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

from .linear_attention import DEFAULT_EPS


def _phi(x):
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _erf(x):
    """Abramowitz & Stegun 7.1.26: |error| <= 1.5e-7 (f32-exact)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ln(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _step_kernel(h0_ref, qkvw_ref, qkvb_ref, wow_ref, wob_ref,
                 ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                 f1w_ref, f1b_ref, f2w_ref, f2b_ref, s_ref,
                 h_out_ref, s_out_ref, h_scr, ao_scr,
                 *, n_layer: int, n_head: int, d_head: int, eps: float,
                 bb: int, n_bblk: int):
    l = pl.program_id(0)
    hi = pl.program_id(1)
    nb = pl.program_id(2)
    rows = pl.dslice(nb * bb, bb)

    @pl.when(jnp.logical_and(l == 0, jnp.logical_and(hi == 0, nb == 0)))
    def _init_h():
        h_scr[...] = h0_ref[...].astype(jnp.float32)

    @pl.when(jnp.logical_and(hi == 0, nb == 0))
    def _init_ao():
        ao_scr[...] = jnp.zeros_like(ao_scr)

    h = h_scr[rows, :]                                       # (BB, D) f32
    qkv = jnp.dot(h, qkvw_ref[0, 0].astype(jnp.float32),
                  preferred_element_type=jnp.float32) + qkvb_ref[0, 0, 0]
    q = _phi(qkv[:, :d_head])
    k = _phi(qkv[:, d_head:2 * d_head])
    v = qkv[:, 2 * d_head:]
    va = jnp.concatenate([v, jnp.ones((bb, 1), jnp.float32)], axis=-1)
    s_new = s_ref[0, 0] + k[:, :, None] * va[:, None, :]    # (BB, E, E+1)
    s_out_ref[0, 0] = s_new
    num = jnp.sum(q[:, :, None] * s_new, axis=1)             # (BB, E+1)
    att_h = num[:, :d_head] / (num[:, d_head:] + eps)
    ao_scr[rows, :] += jnp.dot(att_h, wow_ref[0, 0].astype(jnp.float32),
                               preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(hi == n_head - 1, nb == n_bblk - 1))
    def _ffn():
        hf = h_scr[...]                                      # (B, D)
        h1 = _ln(hf + ao_scr[...] + wob_ref[0, 0], ln1s_ref[0, 0],
                 ln1b_ref[0, 0])
        y = jnp.dot(h1, f1w_ref[0].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + f1b_ref[0, 0]
        y = _gelu_exact(y)
        y = jnp.dot(y, f2w_ref[0].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + f2b_ref[0, 0]
        h2 = _ln(h1 + y, ln2s_ref[0, 0], ln2b_ref[0, 0])
        h_scr[...] = h2

        @pl.when(l == n_layer - 1)
        def _emit():
            h_out_ref[...] = h2.astype(h_out_ref.dtype)


def make_v3_params(params: dict, cfg, dtype=jnp.bfloat16) -> dict:
    """Stack the per-layer weights into the v3 kernel's head-major layout.

    qkvw (L,H,D,3E), qkvb (L,H,3E) f32, wow (L,H,E,D), wob/ln/f*b (L,...)
    f32, f1w (L,D,DI), f2w (L,DI,D).  Matmul weights in `dtype` (bf16
    halves their HBM traffic; compute is f32 in-kernel)."""
    lp = params["layers"]
    L, d, _ = lp["wq"]["w"].shape
    H = cfg.n_head
    e = d // H
    f32 = jnp.float32

    def split_cols(w):   # (L, D, D) -> (L, H, D, E)
        return w.reshape(L, d, H, e).transpose(0, 2, 1, 3)

    qkvw = jnp.concatenate(
        [split_cols(lp["wq"]["w"]), split_cols(lp["wk"]["w"]),
         split_cols(lp["wv"]["w"])], axis=-1)                # (L,H,D,3E)
    qkvb = jnp.concatenate(
        [lp["wq"]["b"].reshape(L, H, e), lp["wk"]["b"].reshape(L, H, e),
         lp["wv"]["b"].reshape(L, H, e)], axis=-1)           # (L,H,3E)
    # bias/LN vectors carry an explicit singleton row: Mosaic requires the
    # last two block dims to be (divisible by 8, 128) or equal to the
    # array dims, which (1, D) blocks of an (L, D) array are not.
    return {
        "qkvw": qkvw.astype(dtype),
        "qkvb": qkvb[:, :, None, :].astype(f32),             # (L,H,1,3E)
        "wow": lp["wo"]["w"].reshape(L, H, e, d).astype(dtype),
        "wob": lp["wo"]["b"][:, None, :].astype(f32),        # (L,1,D)
        "ln1s": lp["ln1"]["scale"][:, None, :].astype(f32),
        "ln1b": lp["ln1"]["bias"][:, None, :].astype(f32),
        "ln2s": lp["ln2"]["scale"][:, None, :].astype(f32),
        "ln2b": lp["ln2"]["bias"][:, None, :].astype(f32),
        "f1w": lp["ffn1"]["w"].astype(dtype),
        "f1b": lp["ffn1"]["b"][:, None, :].astype(f32),
        "f2w": lp["ffn2"]["w"].astype(dtype),
        "f2b": lp["ffn2"]["b"][:, None, :].astype(f32),
    }


def fused_stack_step(v3p: dict, h0: jax.Array, s_aug: jax.Array,
                     *, n_head: int, eps: float = DEFAULT_EPS,
                     interpret: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """All decoder layers on one token in one pallas_call.

    h0 (B, D) post-embedding hidden; s_aug (L, H, B, E, E+1) f32 augmented
    state (S columns + z as the last column).  Returns (h_out, s_aug')."""
    b, d = h0.shape
    L, H = s_aug.shape[0], s_aug.shape[1]
    e = d // n_head
    # batch blocks keep the per-program state slice ~<=0.5MB (~1MB after
    # the 65->128 lane padding) so the whole pipeline — including the
    # double-buffered FFN weights — stays inside Mosaic's 16MB scoped-VMEM
    # budget at any batch size
    bb = b
    for cand in (32, 16, 8):
        if b > 64 and b % cand == 0:
            bb = cand
            break
    n_bblk = b // bb
    kernel = functools.partial(_step_kernel, n_layer=L, n_head=n_head,
                               d_head=e, eps=eps, bb=bb, n_bblk=n_bblk)

    def const(li, hi, nb):
        return (0, 0)

    def per_head4(li, hi, nb):
        return (li, hi, 0, 0)

    def per_layer2(li, hi, nb):
        return (li, 0, 0)

    def per_state(li, hi, nb):
        return (li, hi, nb, 0, 0)

    di = v3p["f1w"].shape[-1]
    in_specs = [
        pl.BlockSpec((b, d), const),                    # h0
        pl.BlockSpec((1, 1, d, 3 * e), per_head4),      # qkvw
        pl.BlockSpec((1, 1, 1, 3 * e), per_head4),      # qkvb (L,H,1,3E)
        pl.BlockSpec((1, 1, e, d), per_head4),          # wow
        pl.BlockSpec((1, 1, d), per_layer2),            # wob  (L,1,D)
        pl.BlockSpec((1, 1, d), per_layer2),            # ln1s
        pl.BlockSpec((1, 1, d), per_layer2),            # ln1b
        pl.BlockSpec((1, 1, d), per_layer2),            # ln2s
        pl.BlockSpec((1, 1, d), per_layer2),            # ln2b
        pl.BlockSpec((1, d, di), per_layer2),           # f1w
        pl.BlockSpec((1, 1, di), per_layer2),           # f1b
        pl.BlockSpec((1, di, d), per_layer2),           # f2w
        pl.BlockSpec((1, 1, d), per_layer2),            # f2b
        pl.BlockSpec((1, 1, bb, e, e + 1), per_state),  # s_aug
    ]
    out_specs = [
        pl.BlockSpec((b, d), const),
        pl.BlockSpec((1, 1, bb, e, e + 1), per_state),
    ]
    scratch = ([pltpu.VMEM((b, d), jnp.float32),
                pltpu.VMEM((b, d), jnp.float32)] if pltpu else [])
    args = (h0, v3p["qkvw"], v3p["qkvb"], v3p["wow"], v3p["wob"],
            v3p["ln1s"], v3p["ln1b"], v3p["ln2s"], v3p["ln2b"],
            v3p["f1w"], v3p["f1b"], v3p["f2w"], v3p["f2b"], s_aug)
    h_out, s_out = pl.pallas_call(
        kernel,
        grid=(L, H, n_bblk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), h0.dtype),
            jax.ShapeDtypeStruct(s_aug.shape, jnp.float32),
        ],
        scratch_shapes=scratch,
        input_output_aliases={len(args) - 1: 1},
        interpret=interpret,
    )(*args)
    return h_out, s_out


def decode_step_v3(params: dict, v3p: dict, cfg, token: jax.Array,
                   state, *, pe_table=None, interpret: bool = False):
    """Drop-in decode_step on the fused kernel.

    `state` is a models.linear_transformer.DecodeState carrying the
    augmented (L, H, B, E, E+1) tensor in `.s` (`.z` unused, kept for
    structural compat).  Numerically matches decode_step to f32 rounding
    (exact-erf gelu in-kernel)."""
    from ..models import common as cm
    from ..models import linear_transformer as lt

    embs = cm.embed_fields(params["emb"], token)
    h = cm.linear(params["in_linear"], embs)
    if pe_table is None:
        pe_table = cm.sinusoidal_table(cfg.max_len, cfg.d_model, h.dtype)
    h = h + pe_table[state.step].astype(h.dtype)
    h_out, s_out = fused_stack_step(v3p, h, state.s, n_head=cfg.n_head,
                                    eps=cfg.attn_eps, interpret=interpret)
    h_out = cm.layernorm(params["final_ln"], h_out)
    return h_out, lt.DecodeState(s_out, state.z, state.step + 1)


def init_aug_state(cfg, batch: int) -> jax.Array:
    e = cfg.d_head
    return jnp.zeros((cfg.n_layer, cfg.n_head, batch, e, e + 1), jnp.float32)
