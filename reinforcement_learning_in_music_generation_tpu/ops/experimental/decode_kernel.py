"""Fused single-token decode layer as one Pallas kernel.

The scan-based decode step (models/linear_transformer.py:decode_step) emits
~15 small XLA ops per layer; at batch 32 the 12-layer step is op-overhead
bound (~0.6 ms/step, BENCH.md).  This kernel fuses one whole decoder layer
— qkv projection, per-head linear-attention state update, output
projection, both layernorms and the FFN — into a single Pallas call, using
the same augmented-column state trick as the training kernels
(S_aug = [S | z], so the denominator is the state's last column).

State layout: (H, B, E, F+1) float32 per layer (head-major so per-head
blocks are plain leading-index slices; no lane-dim reshapes inside the
kernel).  Numerics match linear_attention_step / decode_step except for
the tanh-approximate gelu (Mosaic lacks erf).

STATUS: experimental, parity-tested in interpret mode (both variants).
On the axon v5e both formulations overflow Mosaic's scoped-VMEM stack:
v1 (unrolled heads) ~27MB, v2 (fori_loop + head-major weights) ~23MB vs
the 16MB budget — the f32 (H,B,E,F+1) state is charged twice (in+out)
even with input_output_aliases.  The realistic win is bounded anyway
(~10-20%: TPU while-loop ops have no launch overhead and decode is
weight-bandwidth bound), so the sampler keeps the scan path.  A round-2
formulation would split attention (grid over heads, 0.5MB state blocks)
from the FFN into two lean kernels.
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

from ..linear_attention import DEFAULT_EPS


def _phi(x):
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _ln(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _layer_kernel(h_ref, qkvw_ref, qkvb_ref, wow_ref, wob_ref,
                  ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                  f1w_ref, f1b_ref, f2w_ref, f2b_ref, s_ref,
                  h_out_ref, s_out_ref, *, n_head: int, d_head: int,
                  eps: float):
    h = h_ref[...].astype(jnp.float32)                      # (B, D)
    b, d = h.shape
    qkv = jnp.dot(h, qkvw_ref[...].astype(jnp.float32),
                  preferred_element_type=jnp.float32) + qkvb_ref[...]
    att_parts = []
    for hi in range(n_head):
        lo = hi * d_head
        q_h = _phi(qkv[:, lo:lo + d_head])                  # (B, E)
        k_h = _phi(qkv[:, d + lo:d + lo + d_head])
        v_h = qkv[:, 2 * d + lo:2 * d + lo + d_head]        # (B, E)
        va = jnp.concatenate(
            [v_h, jnp.ones((b, 1), jnp.float32)], axis=-1)  # (B, F+1)
        s_new = s_ref[hi] + k_h[:, :, None] * va[:, None, :]
        s_out_ref[hi] = s_new
        num = jnp.sum(q_h[:, :, None] * s_new, axis=1)      # (B, F+1)
        att_parts.append(num[:, :d_head] / (num[:, d_head:] + eps))
    att = jnp.concatenate(att_parts, axis=-1)               # (B, D)
    ao = jnp.dot(att, wow_ref[...].astype(jnp.float32),
                 preferred_element_type=jnp.float32) + wob_ref[...]
    h = _ln(h + ao, ln1s_ref[...], ln1b_ref[...])
    y = jnp.dot(h, f1w_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + f1b_ref[...]
    # tanh-approximate gelu: Mosaic has no erf/erfc lowering.  Deviation
    # from the exact-gelu reference path is <~1e-3 on activations; the
    # sampler only adopts this kernel where measured faster.
    y = jax.nn.gelu(y, approximate=True)
    y = jnp.dot(y, f2w_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + f2b_ref[...]
    h = _ln(h + y, ln2s_ref[...], ln2b_ref[...])
    h_out_ref[...] = h.astype(h_out_ref.dtype)


def fused_layer_step(h: jax.Array, layer_params: dict, s_aug: jax.Array,
                     *, n_head: int, eps: float = DEFAULT_EPS,
                     interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """One decoder layer on one token.

    h (B, D); layer_params holds this layer's wq/wk/wv/wo/ln1/ln2/ffn1/ffn2
    (unstacked); s_aug (H, B, E, E+1) f32.  Returns (h', s_aug')."""
    b, d = h.shape
    d_head = d // n_head
    lp = layer_params
    qkv_w = jnp.concatenate([lp["wq"]["w"], lp["wk"]["w"], lp["wv"]["w"]], axis=-1)
    qkv_b = jnp.concatenate([lp["wq"]["b"], lp["wk"]["b"], lp["wv"]["b"]], axis=-1)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM) if pltpu else pl.BlockSpec()
    kernel = functools.partial(_layer_kernel, n_head=n_head, d_head=d_head,
                               eps=eps)
    f32 = jnp.float32
    args = (h, qkv_w, qkv_b, lp["wo"]["w"], lp["wo"]["b"].astype(f32),
            lp["ln1"]["scale"].astype(f32), lp["ln1"]["bias"].astype(f32),
            lp["ln2"]["scale"].astype(f32), lp["ln2"]["bias"].astype(f32),
            lp["ffn1"]["w"], lp["ffn1"]["b"].astype(f32),
            lp["ffn2"]["w"], lp["ffn2"]["b"].astype(f32), s_aug)
    h_out, s_out = pl.pallas_call(
        kernel,
        in_specs=[vmem] * len(args),
        out_specs=[vmem, vmem],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), h.dtype),
            jax.ShapeDtypeStruct(s_aug.shape, jnp.float32),
        ],
        # update the (H,B,E,F+1) state in place — halves its VMEM footprint
        input_output_aliases={len(args) - 1: 1},
        interpret=interpret,
    )(*args)
    return h_out, s_out


def _layer_kernel_v2(h_ref, qkvw_ref, qkvb_ref, wow_ref, wob_ref,
                     ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                     f1w_ref, f1b_ref, f2w_ref, f2b_ref, s_ref,
                     h_out_ref, s_out_ref, ao_scratch,
                     *, n_head: int, d_head: int, eps: float):
    """fori_loop-over-heads variant with head-major weights:
    qkvw (H, D, 3E), qkvb (H, 3E), wow (H, E, D).  Temporaries are
    allocated once and reused across heads, bounding scoped VMEM."""
    h = h_ref[...].astype(jnp.float32)                      # (B, D)
    b, d = h.shape
    ao_scratch[...] = jnp.zeros_like(ao_scratch)

    def head_body(hi, _):
        w_h = qkvw_ref[hi].astype(jnp.float32)              # (D, 3E)
        qkv = jnp.dot(h, w_h, preferred_element_type=jnp.float32) + qkvb_ref[hi]
        q_h = _phi(qkv[:, :d_head])
        k_h = _phi(qkv[:, d_head:2 * d_head])
        v_h = qkv[:, 2 * d_head:]
        va = jnp.concatenate(
            [v_h, jnp.ones((b, 1), jnp.float32)], axis=-1)
        s_new = s_ref[hi] + k_h[:, :, None] * va[:, None, :]
        s_out_ref[hi] = s_new
        num = jnp.sum(q_h[:, :, None] * s_new, axis=1)
        att_h = num[:, :d_head] / (num[:, d_head:] + eps)
        ao_scratch[...] += jnp.dot(
            att_h, wow_ref[hi].astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_head, head_body, 0)
    h = _ln(h + ao_scratch[...] + wob_ref[...], ln1s_ref[...], ln1b_ref[...])
    y = jnp.dot(h, f1w_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + f1b_ref[...]
    y = jax.nn.gelu(y, approximate=True)
    y = jnp.dot(y, f2w_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + f2b_ref[...]
    h = _ln(h + y, ln2s_ref[...], ln2b_ref[...])
    h_out_ref[...] = h.astype(h_out_ref.dtype)


def head_major_layer_params(layer_params: dict, n_head: int) -> dict:
    """Reorganize one layer's weights head-major for the v2 kernel."""
    lp = layer_params
    d = lp["wq"]["w"].shape[0]
    e = d // n_head

    def split_cols(w):   # (D, D) -> (H, D, E)
        return w.reshape(d, n_head, e).transpose(1, 0, 2)

    qkvw = jnp.concatenate(
        [split_cols(lp["wq"]["w"]), split_cols(lp["wk"]["w"]),
         split_cols(lp["wv"]["w"])], axis=-1)               # (H, D, 3E)
    qkvb = jnp.concatenate(
        [lp["wq"]["b"].reshape(n_head, e), lp["wk"]["b"].reshape(n_head, e),
         lp["wv"]["b"].reshape(n_head, e)], axis=-1)        # (H, 3E)
    wow = lp["wo"]["w"].reshape(n_head, e, d)               # (H, E, D)
    return {"qkvw": qkvw, "qkvb": qkvb, "wow": wow}


def fused_layer_step_v2(h: jax.Array, layer_params: dict, s_aug: jax.Array,
                        *, n_head: int, eps: float = DEFAULT_EPS,
                        interpret: bool = False):
    b, d = h.shape
    d_head = d // n_head
    lp = layer_params
    hm = head_major_layer_params(lp, n_head)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM) if pltpu else pl.BlockSpec()
    kernel = functools.partial(_layer_kernel_v2, n_head=n_head,
                               d_head=d_head, eps=eps)
    f32 = jnp.float32
    args = (h, hm["qkvw"], hm["qkvb"].astype(f32), hm["wow"],
            lp["wo"]["b"].astype(f32),
            lp["ln1"]["scale"].astype(f32), lp["ln1"]["bias"].astype(f32),
            lp["ln2"]["scale"].astype(f32), lp["ln2"]["bias"].astype(f32),
            lp["ffn1"]["w"], lp["ffn1"]["b"].astype(f32),
            lp["ffn2"]["w"], lp["ffn2"]["b"].astype(f32), s_aug)
    scratch = ([pltpu.VMEM((b, d), jnp.float32)] if pltpu
               else [pltpu and None])
    h_out, s_out = pl.pallas_call(
        kernel,
        in_specs=[vmem] * len(args),
        out_specs=[vmem, vmem],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), h.dtype),
            jax.ShapeDtypeStruct(s_aug.shape, jnp.float32),
        ],
        scratch_shapes=scratch,
        input_output_aliases={len(args) - 1: 1},
        interpret=interpret,
    )(*args)
    return h_out, s_out


def fused_decode_step(params: dict, cfg, token: jax.Array, state,
                      *, pe_table=None, interpret: bool = False,
                      variant: str = "v1"):
    """Drop-in decode_step using the fused layer kernel.

    `state` is a models.linear_transformer.DecodeState whose s/z are kept in
    the kernel's (L, H, B, E, E+1) augmented layout via to/from converters
    below, exposed for benchmarking; generation uses decode_step unless the
    fused path measures faster on the target chip."""
    from ...models import common as cm
    from ...models import linear_transformer as lt

    b = token.shape[0]
    embs = cm.embed_fields(params["emb"], token)
    h = cm.linear(params["in_linear"], embs)
    if pe_table is None:
        pe_table = cm.sinusoidal_table(cfg.max_len, cfg.d_model, h.dtype)
    h = h + pe_table[state.step].astype(h.dtype)

    s_aug = state.s  # here: (L, H, B, E, E+1) aug layout
    step_fn = fused_layer_step if variant == "v1" else fused_layer_step_v2
    new_layers = []
    for li in range(cfg.n_layer):
        lp = jax.tree_util.tree_map(lambda a: a[li], params["layers"])
        h, s_new = step_fn(h, lp, s_aug[li], n_head=cfg.n_head,
                           eps=cfg.attn_eps, interpret=interpret)
        new_layers.append(s_new)
    h = cm.layernorm(params["final_ln"], h)
    new_s = jnp.stack(new_layers)
    return h, lt.DecodeState(new_s, state.z, state.step + 1)


def aug_state_init(cfg, batch: int) -> "jax.Array":
    """Zero (L, H, B, E, E+1) augmented state."""
    e = cfg.d_head
    return jnp.zeros((cfg.n_layer, cfg.n_head, batch, e, e + 1), jnp.float32)


def state_to_aug(s: jax.Array, z: jax.Array) -> jax.Array:
    """(L,B,H,E,F),(L,B,H,E) -> (L,H,B,E,F+1)."""
    sa = jnp.concatenate([s, z[..., None]], axis=-1)
    return sa.transpose(0, 2, 1, 3, 4)


def aug_to_state(sa: jax.Array):
    sb = sa.transpose(0, 2, 1, 3, 4)
    return sb[..., :-1], sb[..., -1]
