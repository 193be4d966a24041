"""Causal linear-attention CP transformer (the flagship model family).

One parameterized implementation covering the reference's duplicated
classes: `LinearTransformer` (dqn_policy/model.py:97-298), `TransformerModel`
(dqn_policy/agent_pretrain.py:213-477), `Actor_Transformer`
(ppo_policy/model.py:98-280, + value head) and the trunk of
`Critic_Transformer` (ppo_policy/model.py:285-394, via models/critic.py).

Architecture (post-norm, matching fast_transformers' TransformerEncoderLayer):

    x -> 6 scaled embeddings -> concat(1216) -> in_linear(512) -> +sinusoidal
      -> 12x [ attn -> +res -> LN1 -> gelu FFN(2048) -> +res -> LN2 ] -> LN
      -> 6 independent heads

Two execution modes, numerically consistent:
  * parallel training mode: `forward_hidden` with the chunked causal linear
    attention kernel (ops/linear_attention.py), `lax.scan` over stacked
    layer params;
  * O(1)-state recurrent decode: `decode_step` carrying per-layer (S, z)
    states — fast_transformers' RecurrentEncoderBuilder equivalent
    (dqn_policy/model.py:141-150,236-238).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LinearTransformerConfig
from ..ops.linear_attention import (
    causal_linear_attention,
    linear_attention_step,
)
from . import common as cm


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_layer(rng: jax.Array, cfg: LinearTransformerConfig) -> dict:
    ks = jax.random.split(rng, 6)
    d = cfg.d_model
    return {
        "wq": cm.init_linear(ks[0], d, d),
        "wk": cm.init_linear(ks[1], d, d),
        "wv": cm.init_linear(ks[2], d, d),
        "wo": cm.init_linear(ks[3], d, d),
        "ln1": cm.init_layernorm(d),
        "ln2": cm.init_layernorm(d),
        "ffn1": cm.init_linear(ks[4], d, cfg.d_inner),
        "ffn2": cm.init_linear(ks[5], cfg.d_inner, d),
    }


def init_params(rng: jax.Array, cfg: LinearTransformerConfig) -> dict:
    k_emb, k_in, k_layers, k_heads, k_val = jax.random.split(rng, 5)
    layer_keys = jax.random.split(k_layers, cfg.n_layer)
    layers = jax.vmap(lambda k: _init_layer(k, cfg))(layer_keys)  # stacked (L, ...)
    params = {
        "emb": cm.init_field_embeddings(k_emb, cfg.vocab_sizes, cfg.emb_sizes),
        "in_linear": cm.init_linear(k_in, sum(cfg.emb_sizes), cfg.d_model),
        "layers": layers,
        "final_ln": cm.init_layernorm(cfg.d_model),
        "heads": cm.init_field_heads(k_heads, cfg.d_model, cfg.vocab_sizes),
    }
    if cfg.with_value_head:
        kv1, kv2 = jax.random.split(k_val)
        params["value_head"] = {
            "l1": cm.init_linear(kv1, cfg.d_model, 128),
            "l2": cm.init_linear(kv2, 128, 1),
        }
    return params


def n_params(params) -> int:
    """Trainable param count (dqn_policy/model.py:61-65 network_paras)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# parallel (training) mode
# ---------------------------------------------------------------------------

def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    b, s, d = x.shape
    return x.reshape(b, s, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def _ffn_backend(n_rows: int, dp_mesh=None) -> str:
    """FFN-tail backend for the training forward.  "pallas" routes the
    ffn1->gelu->dropout->ffn2->dropout->residual->LN2 tail through the
    fused kernel (ops/ffn_block.py, custom VJP, on-core PRNG dropout);
    "pallas-tail" additionally fuses Wo + attention-dropout + residual +
    LN1 (ops/ffn_block.py:attn_tail_block); "xla" is the unfused
    composition.  RLMG_FFN_BACKEND overrides.

    Default: "pallas-tail" on a single-device TPU process (measured
    +16.3% train step over xla at the bench shape, BENCH.md r3) and,
    when the caller threads a dp-only mesh (`dp_mesh`), on multi-device
    TPU as well — batch rows shard cleanly, so the kernel runs per-shard
    under shard_map (no collectives in the tail).  Under tensor
    parallelism (tp>1) the FFN second matmul produces PARTIAL sums that
    need a psum before the residual+LN — fusing LN into the kernel would
    normalize partials — so tp>1 always falls back to xla, even against
    an explicit env override (correctness beats obedience; a warning
    says so)."""
    import os
    import warnings
    import jax
    tp = dp_mesh.shape.get("tp", 1) if dp_mesh is not None else 1
    v = os.environ.get("RLMG_FFN_BACKEND")
    if v:
        if v in ("pallas", "pallas-tail"):
            if tp > 1:
                warnings.warn(
                    f"RLMG_FFN_BACKEND={v} ignored under tp={tp}: the fused "
                    "LN would normalize ffn2's partial sums (wrong "
                    "numerics).  Falling back to xla for this layer.")
                return "xla"
            if dp_mesh is None and jax.device_count() > 1:
                warnings.warn(
                    f"RLMG_FFN_BACKEND={v} forced with "
                    f"{jax.device_count()} devices and no dp mesh: GSPMD "
                    "cannot partition the opaque kernel — thread a dp-only "
                    "mesh (train_losses dp_mesh=...) to shard it, or "
                    "expect replicated execution.")
        return v      # explicit choice wins at any shape
    if jax.default_backend() != "tpu" or tp > 1:
        return "xla"
    if dp_mesh is not None:
        dp = dp_mesh.shape.get("dp", 1)
        if dp > 1:
            # per-shard rows are what the kernel sees
            return "pallas-tail" if n_rows // dp >= _ffn_min_rows() else "xla"
    if jax.device_count() == 1 and n_rows >= _ffn_min_rows():
        return "pallas-tail"
    return "xla"


def _ffn_min_rows() -> int:
    """Row threshold below which the fused-tail default falls back to xla.

    At small N the kernel streams every layer's ~4.5MB of weights from
    HBM per 256-row tile while the matmuls are tiny — weight traffic
    dominates and XLA's fused-into-matmul glue is the better schedule.
    The RL paths (forward_hidden over n_states~50-token windows, N~1.5K,
    and the B=100 x S=50 AIRL disc epoch, N=5K) stay on their
    round-2-tuned XLA programs; the pretrain/discrim-LM paths (N>=14K)
    get the kernel.  RLMG_FFN_MIN_ROWS overrides.  (8192 rather than a
    lower knee also bounds compile risk: every new fused program costs a
    cold remote compile that has been observed at 25+ minutes under
    load, so the default only claims shapes with a measured win.)"""
    import os
    return int(os.environ.get("RLMG_FFN_MIN_ROWS", "8192"))


def _attn_tail_dp(dp_mesh, args, seed, p, block, interpret):
    """attn_tail_block sharded over the mesh's dp axis: batch rows split
    per device (shard_map), weights replicated — the tail is row-local so
    no collectives are needed.  The dropout seed is decorrelated per shard
    (the kernel's on-core PRNG streams by row-block index, which restarts
    at 0 on every shard)."""
    from jax.sharding import PartitionSpec as P

    from ..ops.ffn_block import attn_tail_block
    row, rep = P("dp", None), P()

    def body(h2, att2, *rest):
        ws, sd = rest[:-1], rest[-1]
        sd = sd + jax.lax.axis_index("dp").astype(jnp.int32) * jnp.int32(7919)
        return attn_tail_block(h2, att2, *ws, sd, p, block, interpret)

    n_weights = len(args) - 2          # weight/bias/LN leaves: replicated
    return jax.shard_map(body, mesh=dp_mesh,
                         in_specs=(row, row) + (rep,) * n_weights + (rep,),
                         out_specs=row, check_vma=False)(*args, seed)


def _qkv_attn_dp(dp_mesh, h2d, wqkv, bqkv, n_seq, n_head, chunk, eps,
                 interpret):
    """qkv_attention_block sharded over the mesh's dp axis: sequences
    split per device (shard_map), weights replicated — the chunked causal
    recurrence is sequence-local, so no collectives are needed."""
    from jax.sharding import PartitionSpec as P

    from ..ops.attention_block import qkv_attention_block
    dp = dp_mesh.shape["dp"]
    row, rep = P("dp", None), P()

    def body(h2, w, bq):
        return qkv_attention_block(h2, w, bq, n_seq // dp, n_head,
                                   chunk=chunk, eps=eps, interpret=interpret)

    return jax.shard_map(body, mesh=dp_mesh,
                         in_specs=(row, rep, rep), out_specs=row,
                         check_vma=False)(h2d, wqkv, bqkv)


def _qkv_attention_call(cfg, lp, h, dp_mesh):
    """Fused qkv+attention (ops/attention_block.py) for (b, s, d) `h`,
    mesh-aware: on a dp>1 mesh the opaque pallas_call runs per batch
    shard under shard_map — GSPMD cannot partition a pallas_call, so
    without this the kernel's operands would be all-gathered onto every
    device (the same silent failure VERDICT r3 #5 found for the fused
    tail).  Returns None when the kernel cannot serve the configuration
    (odd n_head, 2D h, tp-sharded projections, batch not divisible by
    dp, seq len not divisible by attn_chunk) — callers fall back to the
    XLA composition."""
    import warnings
    if h.ndim != 3 or cfg.n_head % 2 != 0:
        return None
    b, s, d = h.shape
    tp = dp_mesh.shape.get("tp", 1) if dp_mesh is not None else 1
    dp = dp_mesh.shape.get("dp", 1) if dp_mesh is not None else 1
    if tp > 1:
        # wq/wk/wv are Megatron column-sharded under tp: concatenating
        # them into the kernel's replicated (D, 3D) operand would force
        # an all-gather and defeat the sharding — correctness beats
        # obedience, same contract as _ffn_backend's tp guard
        warnings.warn(
            "attention backend pallas-qkv ignored under tp>1: the qkv "
            "projections are tensor-sharded; using the XLA composition")
        return None
    if dp > 1 and b % dp != 0:
        return None
    chunk = min(cfg.attn_chunk, s)
    if s % chunk != 0:
        # the kernel's grid tiles S into whole chunks; the XLA
        # composition pads internally (_pad_chunk) and handles any length
        return None
    wqkv = jnp.concatenate([lp["wq"]["w"], lp["wk"]["w"], lp["wv"]["w"]],
                           axis=-1)
    bqkv = jnp.concatenate([lp["wq"]["b"], lp["wk"]["b"], lp["wv"]["b"]])
    interpret = os.environ.get("RLMG_ATTN_INTERPRET") == "1"
    h2 = h.reshape(b * s, d)
    if dp > 1:
        att = _qkv_attn_dp(dp_mesh, h2, wqkv, bqkv, b, cfg.n_head, chunk,
                           cfg.attn_eps, interpret)
    else:
        from ..ops.attention_block import qkv_attention_block
        att = qkv_attention_block(h2, wqkv, bqkv, b, cfg.n_head,
                                  chunk=chunk, eps=cfg.attn_eps,
                                  interpret=interpret)
    return att.reshape(b, s, d)


def _layer_forward(cfg: LinearTransformerConfig, h: jax.Array, lp: dict,
                   rng: Optional[jax.Array], deterministic: bool,
                   attn_backend: Optional[str],
                   dp_mesh=None) -> jax.Array:
    r1 = r2 = r3 = None
    if not deterministic and rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    # an explicitly requested attention backend (arg / cfg / env) must not
    # be silently dropped by the fused-tail route, whose attention is the
    # head-minor XLA chunked form; "xla"/None are compatible with it
    explicit_attn = (attn_backend or cfg.attn_backend
                     or os.environ.get("RLMG_ATTN_BACKEND"))
    fused_ok = explicit_attn in (None, "", "xla", "pallas-qkv")
    if (h.ndim == 3 and fused_ok
            and _ffn_backend(h.shape[0] * h.shape[1], dp_mesh)
            == "pallas-tail"):
        # whole post-attention tail (Wo + drop + res + LN1 + FFN + LN2)
        # in one fused kernel (ops/ffn_block.py:attn_tail_block), with the
        # attention run in head-minor (B,S,H,E) layout so q/k/v/att are
        # plain reshapes — no materialized head transposes at the opaque
        # kernel boundary (r3 trace: those copies were ~10ms of a 58ms
        # step)
        from ..ops.ffn_block import attn_tail_block
        from ..ops.linear_attention import causal_linear_attention_bshe
        import os as _os
        b, s, d = h.shape
        dh = d // cfg.n_head
        att = None
        if explicit_attn in ("pallas-qkv", None, ""):
            # qkv projection + chunked recurrence in ONE pallas kernel
            # (ops/attention_block.py) — the (N, 3D) qkv tensor and the
            # per-chunk (C, C) score matrices never touch HBM.  DEFAULT
            # inside the fused-tail shape (rows >= 8192, tp == 1, TPU)
            # since r5: three independent on-chip step A/Bs all favor it
            # (+2.0% r4; +0.73%/+0.78% r5 with ~0.1% run variance —
            # BENCH.md r5).  Explicit "xla" keeps the XLA composition;
            # _qkv_attention_call returns None (clean fallback) for
            # odd heads / tp>1 / ragged chunks.
            att = _qkv_attention_call(cfg, lp, h, dp_mesh)
        if att is None:
            bshe = lambda x: x.reshape(b, s, cfg.n_head, dh)
            att = causal_linear_attention_bshe(
                bshe(cm.linear(lp["wq"], h)), bshe(cm.linear(lp["wk"], h)),
                bshe(cm.linear(lp["wv"], h)), eps=cfg.attn_eps,
                chunk=cfg.attn_chunk)
        # rng=None means "no dropout" (cm.dropout semantics), NOT
        # "dropout with a fixed seed" — p must follow r1, else the fused
        # path would apply identical seed-0 masks every layer/step
        p = 0.0 if (deterministic or r1 is None) else cfg.dropout
        seed = (jax.random.randint(r1, (), 0, 2 ** 30, dtype=jnp.int32)
                if p > 0.0 else jnp.int32(0))
        args = (h.reshape(b * s, d), att.reshape(b * s, d),
                lp["wo"]["w"], lp["wo"]["b"],
                lp["ln1"]["scale"], lp["ln1"]["bias"],
                lp["ffn1"]["w"], lp["ffn1"]["b"],
                lp["ffn2"]["w"], lp["ffn2"]["b"],
                lp["ln2"]["scale"], lp["ln2"]["bias"])
        block = int(_os.environ.get("RLMG_FFN_BLOCK", "256"))
        interp = _os.environ.get("RLMG_FFN_INTERPRET") == "1"
        if dp_mesh is not None and dp_mesh.shape.get("dp", 1) > 1:
            # dp-only mesh: run the kernel per batch shard (shard_map) —
            # GSPMD cannot partition the opaque pallas_call, so without
            # this the mesh used to silently drop to the all-XLA layer
            # (VERDICT r3 #5)
            out = _attn_tail_dp(dp_mesh, args, seed, p, block, interp)
        else:
            out = attn_tail_block(*args, seed, p, block, interp)
        return out.reshape(b, s, d)
    att = None
    if explicit_attn == "pallas-qkv":
        # fused qkv+attention kernel without the fused tail (the tail
        # backend decision is orthogonal — see ops/attention_block.py)
        att = _qkv_attention_call(cfg, lp, h, dp_mesh)
    if att is None:
        q = _split_heads(cm.linear(lp["wq"], h), cfg.n_head)
        k = _split_heads(cm.linear(lp["wk"], h), cfg.n_head)
        v = _split_heads(cm.linear(lp["wv"], h), cfg.n_head)
        ca_backend = attn_backend or cfg.attn_backend
        if ca_backend == "pallas-qkv":   # odd heads / 2D h can't pair-pack
            ca_backend = "xla"
        att = _merge_heads(causal_linear_attention(
            q, k, v, eps=cfg.attn_eps,
            backend=ca_backend, chunk=cfg.attn_chunk))
    att = cm.linear(lp["wo"], att)
    h = cm.layernorm(lp["ln1"], h + cm.dropout(r1, att, cfg.dropout, deterministic))
    if (h.ndim == 3
            and _ffn_backend(h.shape[0] * h.shape[1], dp_mesh) == "pallas"):
        from ..ops.ffn_block import ffn_block
        b, s, d = h.shape
        p = 0.0 if (deterministic or r2 is None) else cfg.dropout
        seed = (jax.random.randint(r2, (), 0, 2 ** 30, dtype=jnp.int32)
                if p > 0.0 else jnp.int32(0))
        import os as _os
        out = ffn_block(h.reshape(b * s, d), lp["ffn1"]["w"], lp["ffn1"]["b"],
                        lp["ffn2"]["w"], lp["ffn2"]["b"],
                        lp["ln2"]["scale"], lp["ln2"]["bias"], seed, p,
                        int(_os.environ.get("RLMG_FFN_BLOCK", "256")),
                        _os.environ.get("RLMG_FFN_INTERPRET") == "1")
        return out.reshape(b, s, d)
    y = jax.nn.gelu(cm.linear(lp["ffn1"], h), approximate=False)
    y = cm.dropout(r2, y, cfg.dropout, deterministic)
    y = cm.linear(lp["ffn2"], y)
    y = cm.dropout(r3, y, cfg.dropout, deterministic)
    return cm.layernorm(lp["ln2"], h + y)


def forward_hidden(params: dict, cfg: LinearTransformerConfig, x: jax.Array,
                   *, deterministic: bool = True,
                   rng: Optional[jax.Array] = None,
                   attn_backend: Optional[str] = None,
                   dp_mesh=None) -> jax.Array:
    """x (B, S, n_fields) int32 -> h (B, S, D).

    Mirrors dqn_policy/model.py:200-233 (embeddings -> in_linear -> pos-enc
    -> causal-linear encoder).

    rng=None means no dropout (cm.dropout semantics).  This must be
    resolved HERE: the layer scan replaces absent rngs with a zeros
    placeholder key for xs-structure reasons, so _layer_forward cannot
    distinguish "no rng" from a real key — without this, rng=None with
    deterministic=False would apply dropout keyed on zeros (identical
    masks every step) on both the XLA and fused paths."""
    deterministic = deterministic or rng is None
    b, s, _ = x.shape
    embs = cm.embed_fields(params["emb"], x)
    h = cm.linear(params["in_linear"], embs)
    pe = cm.sinusoidal_table(s, cfg.d_model, h.dtype)
    h = h + pe[None]
    rng_in = None
    layer_rngs = None
    if not deterministic and rng is not None:
        rng_in, rng_layers = jax.random.split(rng)
        layer_rngs = jax.random.split(rng_layers, cfg.n_layer)
    h = cm.dropout(rng_in, h, cfg.dropout, deterministic)

    def body(h, inp):
        lp, lr = inp
        f = lambda h_, lp_, lr_: _layer_forward(cfg, h_, lp_, lr_,
                                                deterministic, attn_backend,
                                                dp_mesh)
        if cfg.remat:
            # per-layer rematerialization: only layer INPUTS are saved for
            # the backward pass (un-rematted B=128 fwd+bwd needs 17.5GB
            # of intermediates vs the chip's 15.75GB HBM)
            f = jax.checkpoint(f)
        return f(h, lp, lr), None

    if layer_rngs is None:
        layer_rngs = jnp.zeros((cfg.n_layer, 2), jnp.uint32)
    # cfg.scan_unroll > 1 trades compile time for removing the scan-bwd
    # dynamic-update-slice gradient stacking + remat copies (profiled at
    # ~25% of the train step on v5e, BENCH.md round 2).  A python loop
    # over static layer slices was also tried at full unroll: identical
    # speed (71.3 vs 71.9 ms/step) — the remaining DUS grad stacking costs
    # the same as its pad/concat equivalent — so the scan form stays.
    h, _ = jax.lax.scan(body, h, (params["layers"], layer_rngs),
                        unroll=min(cfg.scan_unroll, cfg.n_layer))
    return cm.layernorm(params["final_ln"], h)


def forward_output(params: dict, cfg: LinearTransformerConfig,
                   h: jax.Array) -> Tuple[jax.Array, ...]:
    """h -> tuple of per-field logits (dqn_policy/model.py:241-249)."""
    return cm.apply_field_heads(params["heads"], h, cfg.n_fields)


def value_head(params: dict, h: jax.Array) -> jax.Array:
    """PPO actor value head (ppo_policy/model.py:154-158): D->128->relu->1."""
    y = jax.nn.relu(cm.linear(params["value_head"]["l1"], h))
    return cm.linear_scalar(params["value_head"]["l2"], y)


def train_losses(params: dict, cfg: LinearTransformerConfig, x: jax.Array,
                 target: jax.Array, mask: jax.Array, *,
                 deterministic: bool = False,
                 rng: Optional[jax.Array] = None,
                 attn_backend: Optional[str] = None,
                 dp_mesh=None) -> jax.Array:
    """Per-field masked CE (n_fields,), as LinearTransformer.train_step
    (dqn_policy/model.py:170-197).

    `dp_mesh`: a ('dp','tp') Mesh with tp==1 opts the fused training tail
    into dp-sharded execution (shard_map over batch rows) instead of
    silently falling back to the all-XLA layer on multi-device."""
    from ..ops.losses import fields_cross_entropy
    h = forward_hidden(params, cfg, x, deterministic=deterministic, rng=rng,
                       attn_backend=attn_backend, dp_mesh=dp_mesh)
    logits = forward_output(params, cfg, h)
    return fields_cross_entropy(logits, target, mask)


# ---------------------------------------------------------------------------
# recurrent decode mode
# ---------------------------------------------------------------------------

def make_decode_params(params: dict, cfg: LinearTransformerConfig,
                       dtype=None) -> dict:
    """Decode-optimized parameter layout: qkv projections fused into one
    (L, D, 3D) matmul, the six output heads fused into one (D, sum V)
    matmul — fewer, larger MXU ops per decode step."""
    lp = params["layers"]
    names = cm.field_names(cfg.n_fields)
    dp = {
        "emb": params["emb"],
        "in_linear": params["in_linear"],
        "final_ln": params["final_ln"],
        "qkv_w": jnp.concatenate([lp["wq"]["w"], lp["wk"]["w"], lp["wv"]["w"]],
                                 axis=-1),
        "qkv_b": jnp.concatenate([lp["wq"]["b"], lp["wk"]["b"], lp["wv"]["b"]],
                                 axis=-1),
        "wo": lp["wo"], "ln1": lp["ln1"], "ln2": lp["ln2"],
        "ffn1": lp["ffn1"], "ffn2": lp["ffn2"],
        "head_w": jnp.concatenate([params["heads"][n]["w"] for n in names],
                                  axis=-1),
        "head_b": jnp.concatenate([params["heads"][n]["b"] for n in names],
                                  axis=-1),
    }
    if dtype is not None:
        dp = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype in (jnp.float32, jnp.bfloat16)
            else a, dp)
    return dp


def fused_logits(dparams: dict, cfg: LinearTransformerConfig,
                 h: jax.Array) -> Tuple[jax.Array, ...]:
    """One matmul for all six heads, split per field."""
    all_logits = h @ dparams["head_w"] + dparams["head_b"]
    out = []
    off = 0
    for v in cfg.vocab_sizes:
        out.append(all_logits[..., off:off + v])
        off += v
    return tuple(out)


def decode_step_fused(dparams: dict, cfg: LinearTransformerConfig,
                      token: jax.Array, state: "DecodeState", *,
                      pe_table: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, "DecodeState"]:
    """decode_step on the fused layout, with the layer loop unrolled.

    NOTE: measured ~40% slower than the plain scan path on TPU v5e (the
    unrolled 12-layer body schedules worse than the rolled loop), so the
    sampler uses decode_step; kept for future kernel-fusion work."""
    b = token.shape[0]
    embs = cm.embed_fields(dparams["emb"], token)
    h = cm.linear(dparams["in_linear"], embs)
    if pe_table is None:
        pe_table = cm.sinusoidal_table(cfg.max_len, cfg.d_model, h.dtype)
    h = h + pe_table[state.step].astype(h.dtype)

    def body(h, inp):
        qkv_w, qkv_b, wo, ln1, ln2, ffn1, ffn2, s_l, z_l = inp
        qkv = h @ qkv_w + qkv_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (b, cfg.n_head, cfg.d_head)
        q = q.reshape(shape).astype(s_l.dtype)
        k = k.reshape(shape).astype(s_l.dtype)
        v = v.reshape(shape).astype(s_l.dtype)
        att, (s_l, z_l) = linear_attention_step(q, k, v, (s_l, z_l),
                                                eps=cfg.attn_eps)
        att = cm.linear(wo, att.astype(h.dtype).reshape(b, cfg.d_model))
        h = cm.layernorm(ln1, h + att)
        y = jax.nn.gelu(cm.linear(ffn1, h), approximate=False)
        h = cm.layernorm(ln2, h + cm.linear(ffn2, y))
        return h, (s_l, z_l)

    h, (new_s, new_z) = jax.lax.scan(
        body, h,
        (dparams["qkv_w"], dparams["qkv_b"], dparams["wo"], dparams["ln1"],
         dparams["ln2"], dparams["ffn1"], dparams["ffn2"], state.s, state.z),
        unroll=cfg.n_layer)
    h = cm.layernorm(dparams["final_ln"], h)
    return h, DecodeState(new_s, new_z, state.step + 1)


class DecodeState(NamedTuple):
    s: jax.Array       # (L, B, H, Dh, Dh) running sum phi(k) v^T per layer
    z: jax.Array       # (L, B, H, Dh)
    step: jax.Array    # () int32 absolute position (for positional encoding)


def init_decode_state(cfg: LinearTransformerConfig, batch: int,
                      dtype=jnp.float32) -> DecodeState:
    dh = cfg.d_head
    return DecodeState(
        s=jnp.zeros((cfg.n_layer, batch, cfg.n_head, dh, dh), dtype),
        z=jnp.zeros((cfg.n_layer, batch, cfg.n_head, dh), dtype),
        step=jnp.zeros((), jnp.int32),
    )


def decode_step(params: dict, cfg: LinearTransformerConfig, token: jax.Array,
                state: DecodeState, *, pe_table: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, DecodeState]:
    """One-token forward: token (B, n_fields) int -> (h_last (B, D), state').

    Numerically identical to the parallel path at the same position; the
    fast_transformers recurrent mode (dqn_policy/model.py:236-238).
    ``pe_table``: optional precomputed sinusoidal table to avoid rebuilding.
    """
    b = token.shape[0]
    embs = cm.embed_fields(params["emb"], token)
    h = cm.linear(params["in_linear"], embs)                 # (B, D)
    if pe_table is None:
        pe_table = cm.sinusoidal_table(cfg.max_len, cfg.d_model, h.dtype)
    h = h + pe_table[state.step].astype(h.dtype)

    def body(h, inp):
        lp, s_l, z_l = inp
        # qkv may be bf16 (weight-bandwidth bound decode); the recurrent
        # (S, z) accumulation state stays f32 for long-sequence stability.
        q = (cm.linear(lp["wq"], h)).reshape(b, cfg.n_head, cfg.d_head).astype(s_l.dtype)
        k = (cm.linear(lp["wk"], h)).reshape(b, cfg.n_head, cfg.d_head).astype(s_l.dtype)
        v = (cm.linear(lp["wv"], h)).reshape(b, cfg.n_head, cfg.d_head).astype(s_l.dtype)
        att, (s_l, z_l) = linear_attention_step(q, k, v, (s_l, z_l), eps=cfg.attn_eps)
        att = cm.linear(lp["wo"], att.astype(h.dtype).reshape(b, cfg.d_model))
        h = cm.layernorm(lp["ln1"], h + att)
        y = jax.nn.gelu(cm.linear(lp["ffn1"], h), approximate=False)
        y = cm.linear(lp["ffn2"], y)
        h = cm.layernorm(lp["ln2"], h + y)
        return h, (s_l, z_l)

    h, (new_s, new_z) = jax.lax.scan(body, h, (params["layers"], state.s, state.z))
    h = cm.layernorm(params["final_ln"], h)
    return h, DecodeState(new_s, new_z, state.step + 1)


def prefill_bucket(t: int, quantum: int = 64) -> int:
    """Static padded length for forward_prefill: next multiple of
    `quantum`.  Every distinct padded length is its own compiled program
    (cold remote compiles have been observed at 25+ min under load —
    BENCH.md), so prompts bucket rather than compile per exact length."""
    return max(quantum, -(-t // quantum) * quantum)


def forward_prefill(params: dict, cfg: LinearTransformerConfig,
                    x: jax.Array, n_valid=None, *,
                    pe_table: Optional[jax.Array] = None,
                    state_dtype=jnp.float32
                    ) -> Tuple[jax.Array, DecodeState]:
    """Parallel prompt ingestion (the serving prefill/decode split): one
    training-style forward pass over the prompt that also returns the
    recurrent decode state after the last valid token — the closed form
    of scanning decode_step over the prompt,

        S_l = sum_t phi(k_t) v_t^T,   z_l = sum_t phi(k_t),

    but O(T) parallel on the MXU instead of T sequential per-token steps.
    Replaces the teacher-forced lax.scan seeding for long prompts
    (cli generate --prompt; the reference's inference loop re-runs the
    FULL prefix every generated token instead —
    /root/reference/ppo_policy/inference.py:101-134).

    x (B, T, n_fields) int32, where T is a static padded length
    (prefill_bucket); `n_valid` (traced scalar, default T) marks the
    prompt's true length — positions >= n_valid contribute nothing to
    the state and h_last is read at n_valid-1.  Deterministic (no
    dropout), like the decode path.  Numerics: the chunked parallel
    attention accumulates in a different order than the per-token scan,
    so streams are float-close but not bit-identical — greedy
    byte-stable seeding keeps the scan (generate_songs pin).

    Returns (h_last (B, D) after final_ln, DecodeState at step=n_valid).
    """
    from ..ops.linear_attention import (causal_linear_attention_bshe,
                                        feature_map)
    b, t, _ = x.shape
    if n_valid is None:
        n_valid = t
    n_valid = jnp.asarray(n_valid, jnp.int32)
    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, t, 1, 1), 1)
             < n_valid)                                    # (1, T, 1, 1)
    embs = cm.embed_fields(params["emb"], x)
    h = cm.linear(params["in_linear"], embs)               # (B, T, D)
    if pe_table is None:
        pe_table = cm.sinusoidal_table(cfg.max_len, cfg.d_model, h.dtype)
    h = h + pe_table[:t][None].astype(h.dtype)

    def body(h, lp):
        bshe = lambda a: a.reshape(b, t, cfg.n_head, cfg.d_head)
        q = bshe(cm.linear(lp["wq"], h))
        k = bshe(cm.linear(lp["wk"], h))
        v = bshe(cm.linear(lp["wv"], h))
        # state accumulates in f32 regardless of the weight dtype
        # (decode_step's long-sequence stability contract); pad
        # positions are masked out of the sums
        pk = feature_map(k.astype(state_dtype)) * valid
        v32 = v.astype(state_dtype)
        s_l = jnp.einsum("bthe,bthf->bhef", pk, v32)
        z_l = jnp.sum(pk, axis=1)
        att = causal_linear_attention_bshe(q, k, v, eps=cfg.attn_eps,
                                           chunk=min(cfg.attn_chunk, t))
        att = cm.linear(lp["wo"], att.reshape(b, t, cfg.d_model))
        h = cm.layernorm(lp["ln1"], h + att)
        y = jax.nn.gelu(cm.linear(lp["ffn1"], h), approximate=False)
        y = cm.linear(lp["ffn2"], y)
        h = cm.layernorm(lp["ln2"], h + y)
        return h, (s_l, z_l)

    h, (s, z) = jax.lax.scan(body, h, params["layers"],
                             unroll=min(cfg.scan_unroll, cfg.n_layer))
    h_last = jnp.take_along_axis(
        h, (n_valid - 1)[None, None, None].astype(jnp.int32)
        * jnp.ones((b, 1, 1), jnp.int32), axis=1)[:, 0]
    h_last = cm.layernorm(params["final_ln"], h_last)
    return h_last, DecodeState(s, z, n_valid)
