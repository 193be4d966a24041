"""Whole-decode-step fused kernel, head-PAIR packed (v4).

v3 (ops/decode_kernel_v3.py) is VPU-bound on the augmented state ops: the
(B, E, E+1=65) blocks pad to 128 lanes, wasting half the vector unit, and
its (L, H, NB) grid pays ~7us of program latency 96+ times per step.

v4 packs TWO heads per program so every elementwise state op runs on
fully-utilized 128-lane rows (E=64 per head):

  * S state (L, H/2, B, E, 2E): lanes = [head0 v-cols | head1 v-cols];
  * z state (L, H/2, B, 2E) kept separate (the v3 augmented column is what
    forced the 65-lane shape);
  * qkv weights (L, H/2, D, 6E) with columns [q0|q1|k0|k1|v0|v1];
  * the attention denominator broadcast uses one MXU matmul with a
    block-diagonal ones matrix instead of lane segment-reductions;
  * grid (L, H/2, NB) — half the programs of v3.

Numerics identical to decode_step / v3 (same f32 state math, same
exact-erf gelu).  Requires even n_head; the sampler falls back to v3
otherwise.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from .decode_kernel_v3 import _gelu_exact, _ln, _phi
from .linear_attention import DEFAULT_EPS


def _pair_kernel(h0_ref, qkvw_ref, qkvb_ref, wow_ref, wob_ref,
                 ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                 f1w_ref, f1b_ref, f2w_ref, f2b_ref, s_ref, z_ref,
                 h_out_ref, s_out_ref, z_out_ref, h_scr, ao_scr,
                 *, n_layer: int, n_pair: int, d_head: int, eps: float,
                 bb: int, n_bblk: int):
    l = pl.program_id(0)
    p = pl.program_id(1)
    nb = pl.program_id(2)
    rows = pl.dslice(nb * bb, bb)
    e = d_head

    @pl.when(jnp.logical_and(l == 0, jnp.logical_and(p == 0, nb == 0)))
    def _init_h():
        h_scr[...] = h0_ref[...].astype(jnp.float32)

    @pl.when(jnp.logical_and(p == 0, nb == 0))
    def _init_ao():
        ao_scr[...] = jnp.zeros_like(ao_scr)

    h = h_scr[rows, :]                                       # (BB, D) f32
    qkv = jnp.dot(h, qkvw_ref[0, 0].astype(jnp.float32),
                  preferred_element_type=jnp.float32) + qkvb_ref[0, 0, 0]
    q01 = _phi(qkv[:, :2 * e])                               # (BB, 2E)
    k01 = _phi(qkv[:, 2 * e:4 * e])
    v01 = qkv[:, 4 * e:]
    q0, q1 = q01[:, :e], q01[:, e:]
    k0, k1 = k01[:, :e], k01[:, e:]
    v0, v1 = v01[:, :e], v01[:, e:]

    # per-half outer products (the sublane x lane broadcast multiply is the
    # one form Mosaic lowers without a gather; a broadcast_to across lanes
    # from sublane-resident data is NOT lowerable), packed along lanes
    upd = jnp.concatenate([k0[:, :, None] * v0[:, None, :],
                           k1[:, :, None] * v1[:, None, :]], axis=-1)
    # state may be stored sub-f32 (RLMG_DECODE_STATE_DTYPE=bfloat16 halves
    # the dominant HBM traffic); accumulate in f32, round only on store
    s_new = s_ref[0, 0].astype(jnp.float32) + upd            # (BB, E, 2E)
    s_out_ref[0, 0] = s_new.astype(s_out_ref.dtype)
    z_new = z_ref[0, 0].astype(jnp.float32) + k01            # (BB, 2E)
    z_out_ref[0, 0] = z_new.astype(z_out_ref.dtype)

    num = jnp.concatenate(
        [jnp.sum(q0[:, :, None] * s_new[:, :, :e], axis=1),
         jnp.sum(q1[:, :, None] * s_new[:, :, e:], axis=1)], axis=-1)
    # denominator q.z per head, broadcast back to that head's lanes with
    # one MXU matmul against a block-diagonal ones matrix
    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * e, 2 * e), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2 * e, 2 * e), 1)
    blockdiag = ((lane < e) == (lane2 < e)).astype(jnp.float32)
    den = jnp.dot(q01 * z_new, blockdiag,
                  preferred_element_type=jnp.float32)        # (BB, 2E)
    att01 = num / (den + eps)
    ao_scr[rows, :] += jnp.dot(att01, wow_ref[0, 0].astype(jnp.float32),
                               preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(p == n_pair - 1, nb == n_bblk - 1))
    def _ffn():
        hf = h_scr[...]
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


def make_v4_params(params: dict, cfg, dtype=jnp.bfloat16) -> dict:
    """Head-pair packed weights: qkvw (L,P,D,6E) cols [q0|q1|k0|k1|v0|v1],
    wow (L,P,2E,D); biases/LN as in v3 but pair-packed."""
    lp = params["layers"]
    L, d, _ = lp["wq"]["w"].shape
    H = cfg.n_head
    assert H % 2 == 0, "v4 requires even n_head"
    P = H // 2
    e = d // H
    f32 = jnp.float32

    def pair_cols(w):    # (L, D, D) -> (L, P, D, 2E)
        return w.reshape(L, d, P, 2 * e).transpose(0, 2, 1, 3)

    def pair_bias(bias):  # (L, D) -> (L, P, 2E)
        return bias.reshape(L, P, 2 * e)

    qkvw = jnp.concatenate(
        [pair_cols(lp["wq"]["w"]), pair_cols(lp["wk"]["w"]),
         pair_cols(lp["wv"]["w"])], axis=-1)                 # (L,P,D,6E)
    qkvb = jnp.concatenate(
        [pair_bias(lp["wq"]["b"]), pair_bias(lp["wk"]["b"]),
         pair_bias(lp["wv"]["b"])], axis=-1)                 # (L,P,6E)
    return {
        "qkvw": qkvw.astype(dtype),
        "qkvb": qkvb[:, :, None, :].astype(f32),             # (L,P,1,6E)
        "wow": lp["wo"]["w"].reshape(L, P, 2 * e, d).astype(dtype),
        "wob": lp["wo"]["b"][:, None, :].astype(f32),
        "ln1s": lp["ln1"]["scale"][:, None, :].astype(f32),
        "ln1b": lp["ln1"]["bias"][:, None, :].astype(f32),
        "ln2s": lp["ln2"]["scale"][:, None, :].astype(f32),
        "ln2b": lp["ln2"]["bias"][:, None, :].astype(f32),
        "f1w": lp["ffn1"]["w"].astype(dtype),
        "f1b": lp["ffn1"]["b"][:, None, :].astype(f32),
        "f2w": lp["ffn2"]["w"].astype(dtype),
        "f2b": lp["ffn2"]["b"][:, None, :].astype(f32),
    }


def fused_stack_step_v4(v4p: dict, h0: jax.Array, s: jax.Array,
                        z: jax.Array, *, n_head: int,
                        eps: float = DEFAULT_EPS, interpret: bool = False
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """All layers, one token, one pallas_call.  s (L, P, B, E, 2E) f32,
    z (L, P, B, 2E) f32.  Returns (h_out, s', z')."""
    b, d = h0.shape
    L, P = s.shape[0], s.shape[1]
    e = d // n_head
    bb = b
    for cand in (32, 16, 8):
        if b > 64 and b % cand == 0:
            bb = cand
            break
    bb_env = int(os.environ.get("RLMG_V4_BB", "0"))
    if bb_env and b % bb_env == 0:
        bb = bb_env
    n_bblk = b // bb
    kernel = functools.partial(_pair_kernel, n_layer=L, n_pair=P, d_head=e,
                               eps=eps, bb=bb, n_bblk=n_bblk)

    def const(li, p, nb):
        return (0, 0)

    def per_pair4(li, p, nb):
        return (li, p, 0, 0)

    def per_layer2(li, p, nb):
        return (li, 0, 0)

    def per_s(li, p, nb):
        return (li, p, nb, 0, 0)

    def per_z(li, p, nb):
        return (li, p, nb, 0)

    di = v4p["f1w"].shape[-1]
    in_specs = [
        pl.BlockSpec((b, d), const),                     # h0
        pl.BlockSpec((1, 1, d, 6 * e), per_pair4),       # qkvw
        pl.BlockSpec((1, 1, 1, 6 * e), per_pair4),       # qkvb
        pl.BlockSpec((1, 1, 2 * e, d), per_pair4),       # wow
        pl.BlockSpec((1, 1, d), per_layer2),             # wob
        pl.BlockSpec((1, 1, d), per_layer2),             # ln1s
        pl.BlockSpec((1, 1, d), per_layer2),             # ln1b
        pl.BlockSpec((1, 1, d), per_layer2),             # ln2s
        pl.BlockSpec((1, 1, d), per_layer2),             # ln2b
        pl.BlockSpec((1, d, di), per_layer2),            # f1w
        pl.BlockSpec((1, 1, di), per_layer2),            # f1b
        pl.BlockSpec((1, di, d), per_layer2),            # f2w
        pl.BlockSpec((1, 1, d), per_layer2),             # f2b
        pl.BlockSpec((1, 1, bb, e, 2 * e), per_s),       # s
        pl.BlockSpec((1, 1, bb, 2 * e), per_z),          # z
    ]
    out_specs = [
        pl.BlockSpec((b, d), const),
        pl.BlockSpec((1, 1, bb, e, 2 * e), per_s),
        pl.BlockSpec((1, 1, bb, 2 * e), per_z),
    ]
    scratch = ([pltpu.VMEM((b, d), jnp.float32),
                pltpu.VMEM((b, d), jnp.float32)] if pltpu else [])
    args = (h0, v4p["qkvw"], v4p["qkvb"], v4p["wow"], v4p["wob"],
            v4p["ln1s"], v4p["ln1b"], v4p["ln2s"], v4p["ln2b"],
            v4p["f1w"], v4p["f1b"], v4p["f2w"], v4p["f2b"], s, z)
    h_out, s_out, z_out = pl.pallas_call(
        kernel,
        grid=(L, P, n_bblk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), h0.dtype),
            jax.ShapeDtypeStruct(s.shape, s.dtype),
            jax.ShapeDtypeStruct(z.shape, z.dtype),
        ],
        scratch_shapes=scratch,
        input_output_aliases={len(args) - 2: 1, len(args) - 1: 2},
        interpret=interpret,
        # raise the compiler's 16MB scoped-VMEM default (v5e has 128MiB
        # physical VMEM) so larger batch blocks fit: bb=64 at B=512 needs
        # ~20MB of double-buffered state + FFN weights and halves the
        # program count, which is the binding cost at large batch
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=100 << 20)
                         if (pltpu and not interpret) else None),
    )(*args)
    return h_out, s_out, z_out


class PairState:
    """Lightweight (s, z, step) carrier registered as a pytree."""

    def __init__(self, s, z, step):
        self.s, self.z, self.step = s, z, step


jax.tree_util.register_pytree_node(
    PairState,
    lambda st: ((st.s, st.z, st.step), None),
    lambda _, ch: PairState(*ch))


def state_dtype():
    """Decode recurrent-state storage dtype — shared helper so the env var
    means the same thing on the v4 and v6 paths (ops/decode_common.py)."""
    from .decode_common import decode_state_dtype
    return decode_state_dtype()


def init_pair_state(cfg, batch: int, dtype=None) -> PairState:
    e = cfg.d_head
    P = cfg.n_head // 2
    dt = state_dtype() if dtype is None else dtype
    return PairState(
        jnp.zeros((cfg.n_layer, P, batch, e, 2 * e), dt),
        jnp.zeros((cfg.n_layer, P, batch, 2 * e), dt),
        jnp.zeros((), jnp.int32))


def decode_step_v4(params: dict, v4p: dict, cfg, token: jax.Array,
                   state: PairState, *, pe_table=None,
                   interpret: bool = False):
    from ..models import common as cm

    embs = cm.embed_fields(params["emb"], token)
    h = cm.linear(params["in_linear"], embs)
    if pe_table is None:
        pe_table = cm.sinusoidal_table(cfg.max_len, cfg.d_model, h.dtype)
    h = h + pe_table[state.step].astype(h.dtype)
    h_out, s_out, z_out = fused_stack_step_v4(
        v4p, h, state.s, state.z, n_head=cfg.n_head, eps=cfg.attn_eps,
        interpret=interpret)
    h_out = cm.layernorm(params["final_ln"], h_out)
    return h_out, PairState(s_out, z_out, state.step + 1)
