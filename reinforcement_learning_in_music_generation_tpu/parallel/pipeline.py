"""GPipe-style pipeline parallelism over the stacked layer axis.

Green-field (the reference is single-GPU single-process, SURVEY §2.5):
the flagship LinearTransformer keeps its per-layer parameters stacked on
a leading (L, ...) axis (models/linear_transformer.py:init_params), so
pipeline parallelism is a natural third sharding axis next to dp/tp/sp —
each of `pp` stages owns a contiguous (L/pp, ...) slab of layers and
microbatches stream through the stages over ICI via `lax.ppermute`.

Design (the scaling-book pipelining recipe, written for XLA):

  * one `shard_map` over a ('dp', 'pp') mesh; weights for the layer stack
    carry `P('pp', ...)` on the leading layer axis, batch rows shard over
    'dp', everything else is replicated;
  * inside, a `lax.scan` over M + pp - 1 ticks: stage 0 injects
    microbatch t, every stage runs its local layer slab, the activation
    hops to the next stage with a single `ppermute` per tick (ICI
    neighbor traffic, never DCN);
  * the last stage accumulates its results and a final `psum` over 'pp'
    replicates them (every other stage contributes zeros), so the heads /
    loss run identically on all stages;
  * the whole loop is plain differentiable JAX — `ppermute` transposes to
    the reverse permute, so `jax.grad` *is* the reverse pipeline
    (backward microbatches drain in the opposite stage order).  No
    hand-written backward schedule.

Bubble fraction is the textbook (pp-1)/(M+pp-1); callers pick
`n_microbatch` (default 2*pp) to trade bubble against per-microbatch MXU
efficiency.  Activation memory is GPipe-without-recompute by default;
`cfg.remat` wraps each stage in `jax.checkpoint` exactly like the
single-device layer scan.

With a third 'tp' mesh axis the pipeline composes with Megatron tensor
parallelism INSIDE each stage (_layer_forward_tp): column shards own
whole heads / hidden slices, row-parallel matmuls all-reduce with one
manual psum('tp') each (the shard_map body is fully manual, so the
collectives are explicit rather than GSPMD-inserted).  3D dp x pp x tp
meshes come out of `make_pp_mesh(pp, dp, tp)`.

The reference has nothing comparable: its 12-layer model must fit one
GPU (dqn_policy/agent_pretrain.py trains single-device only).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LinearTransformerConfig
from ..models import common as cm
from ..models import linear_transformer as lt


def make_pp_mesh(pp: int, dp: int = 1, tp: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """('dp', 'pp'[, 'tp']) mesh.  tp is the minor axis (Megatron
    all-reduces are the chattiest traffic, so they ride nearest-neighbor
    ICI links); pp hops are one ppermute per microbatch tick."""
    devices = list(devices if devices is not None else jax.devices())
    if dp * pp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{pp}x{tp} needs {dp * pp * tp} "
                         f"devices, have {len(devices)}")
    if tp > 1:
        arr = np.array(devices[: dp * pp * tp]).reshape(dp, pp, tp)
        return Mesh(arr, axis_names=("dp", "pp", "tp"))
    arr = np.array(devices[: dp * pp]).reshape(dp, pp)
    return Mesh(arr, axis_names=("dp", "pp"))


def pp_param_shardings(mesh: Mesh, params) -> dict:
    """Layer-stack leaves shard their leading (L,) axis over 'pp' and,
    when the mesh carries a 'tp' axis, their Megatron dims over 'tp'
    (same column/row layout as parallel/sharding.py — the stacked-layer
    rules there already place 'tp', this substitutes 'pp' for the
    leading layer axis).  Embeddings / in_linear / final_ln / heads are
    replicated over pp (they run outside the pipeline) and keep their
    Megatron tp specs."""
    from .sharding import spec_for_path
    tp = mesh.shape.get("tp", 1)

    def spec(kp, leaf):
        path = jax.tree_util.keystr(kp)
        if "['layers']" in path:
            inner = (None,) * (leaf.ndim - 1)
            if tp > 1:
                rule = spec_for_path(path, leaf.ndim)
                if len(rule) == leaf.ndim and rule[0] is None:
                    inner = tuple(rule)[1:]
            return NamedSharding(mesh, P(*(("pp",) + inner)))
        if tp > 1:
            rule = spec_for_path(path, leaf.ndim)
            return NamedSharding(mesh, rule)
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_pp(mesh: Mesh, params) -> dict:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params,
        pp_param_shardings(mesh, params))


def _microbatch(h: jax.Array, m: int) -> jax.Array:
    b = h.shape[0]
    return h.reshape((m, b // m) + h.shape[1:])


def _layer_forward_tp(cfg: LinearTransformerConfig, h: jax.Array, lp: dict,
                      rng, deterministic: bool, tp: int) -> jax.Array:
    """One transformer layer with MANUAL Megatron tensor parallelism,
    for use inside the (fully-manual) pipeline shard_map: wq/wk/wv and
    ffn1 are column-sharded (each tp shard owns n_head/tp heads and
    d_inner/tp hidden units — no collective), wo and ffn2 are
    row-sharded and their partial sums all-reduce with one psum('tp')
    each; biases of the row-parallel matmuls are added once, after the
    psum.  Same math as models/linear_transformer.py:_layer_forward's
    XLA composition (dqn_policy/model.py:128-137 layer semantics);
    activations stay tp-replicated so LN is exact, not partial-sum
    (the failure mode the fused-kernel tp guard protects against).

    Dropout masks use the same key on every tp shard, so the
    tp-replicated activations stay bit-identical across shards; the
    column-sharded ffn hidden mask repeats the per-shard pattern
    (distribution-equal, not bit-equal, to the single-device draw —
    same caveat as the dp microbatch decorrelation)."""
    from ..models.linear_transformer import _merge_heads, _split_heads
    from ..ops.linear_attention import causal_linear_attention
    r1 = r2 = r3 = None
    if not deterministic and rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    h_loc = cfg.n_head // tp
    q = _split_heads(cm.linear(lp["wq"], h), h_loc)
    k = _split_heads(cm.linear(lp["wk"], h), h_loc)
    v = _split_heads(cm.linear(lp["wv"], h), h_loc)
    att = _merge_heads(causal_linear_attention(
        q, k, v, eps=cfg.attn_eps, backend="xla", chunk=cfg.attn_chunk))
    att = jax.lax.psum(att @ lp["wo"]["w"], "tp") + lp["wo"]["b"]
    h = cm.layernorm(lp["ln1"],
                     h + cm.dropout(r1, att, cfg.dropout, deterministic))
    y = jax.nn.gelu(cm.linear(lp["ffn1"], h), approximate=False)
    y = cm.dropout(r2, y, cfg.dropout, deterministic)
    y = jax.lax.psum(y @ lp["ffn2"]["w"], "tp") + lp["ffn2"]["b"]
    y = cm.dropout(r3, y, cfg.dropout, deterministic)
    return cm.layernorm(lp["ln2"], h + y)


def pipeline_forward_hidden(params: dict, cfg: LinearTransformerConfig,
                            x: jax.Array, mesh: Mesh, *,
                            n_microbatch: Optional[int] = None,
                            deterministic: bool = True,
                            rng: Optional[jax.Array] = None) -> jax.Array:
    """forward_hidden under ('dp','pp') pipeline parallelism.

    x (B, S, n_fields) int32 -> h (B, S, D), numerically the same math as
    lt.forward_hidden (same layer order, same chunked attention); batch B
    must divide by dp * n_microbatch.  Embeddings/in-proj/pos-enc and the
    final LN run replicated outside the pipeline body (they are ~2% of
    the FLOPs); the 12-layer trunk runs staged.
    """
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    if cfg.n_layer % pp != 0:
        raise ValueError(f"n_layer={cfg.n_layer} not divisible by pp={pp}")
    if cfg.n_head % tp != 0 or cfg.d_inner % tp != 0:
        raise ValueError(
            f"tp={tp} must divide n_head={cfg.n_head} and "
            f"d_inner={cfg.d_inner} (Megatron column shards)")
    m = n_microbatch or min(2 * pp, x.shape[0] // dp)
    b, s, _ = x.shape
    if b % (dp * m) != 0:
        raise ValueError(f"batch {b} not divisible by dp*m={dp}*{m}")

    deterministic = deterministic or rng is None
    embs = cm.embed_fields(params["emb"], x)
    h = cm.linear(params["in_linear"], embs)
    pe = cm.sinusoidal_table(s, cfg.d_model, h.dtype)
    h = h + pe[None]
    rng_in = None
    layer_rngs = jnp.zeros((cfg.n_layer, 2), jnp.uint32)
    if not deterministic:
        rng_in, rng_layers = jax.random.split(rng)
        layer_rngs = jax.random.split(rng_layers, cfg.n_layer)
    h = cm.dropout(rng_in, h, cfg.dropout, deterministic)

    h_mb = _microbatch(h, m)                       # (M, B/M, S, D)

    def stage_fn(layers_local, lrngs_local, x_in, mb_idx):
        def body(hh, inp):
            lp, lr = inp
            if not deterministic:
                # decorrelate masks across dp shards and microbatches (the
                # single-device path draws ONE mask over the whole batch;
                # per-microbatch reuse of the layer key would correlate
                # rows at the same offset of different microbatches).
                # NOT folded over tp: tp shards must draw identical masks
                # to keep the replicated activations bit-identical.
                lr = jax.random.fold_in(
                    lr, mb_idx * 131 + jax.lax.axis_index("dp"))
            if tp > 1:
                f = lambda h_, lp_, lr_: _layer_forward_tp(
                    cfg, h_, lp_, lr_ if not deterministic else None,
                    deterministic, tp)
            else:
                f = lambda h_, lp_, lr_: lt._layer_forward(
                    cfg, h_, lp_, lr_ if not deterministic else None,
                    deterministic, "xla", None)
            if cfg.remat:
                f = jax.checkpoint(f)
            return f(hh, lp, lr), None
        out, _ = jax.lax.scan(body, x_in, (layers_local, lrngs_local))
        return out

    def pipe_body(layers_local, lrngs_local, h_local):
        # h_local: (M, B/(M*dp) rows, S, D); layers_local: (L/pp, ...)
        stage = jax.lax.axis_index("pp")
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        buf = jnp.zeros_like(h_local[0])
        acc = jnp.zeros_like(h_local)

        def tick(carry, t):
            buf, acc = carry
            inject = jax.lax.dynamic_index_in_dim(
                h_local, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            x_in = jnp.where(stage == 0, inject, buf)
            y = stage_fn(layers_local, lrngs_local, x_in, t - stage)
            oidx = jnp.clip(t - (pp - 1), 0, m - 1)
            write = jnp.logical_and(stage == pp - 1, t >= pp - 1)
            cur = jax.lax.dynamic_index_in_dim(acc, oidx, 0, keepdims=False)
            acc = jax.lax.dynamic_update_index_in_dim(
                acc, jnp.where(write, y, cur), oidx, 0)
            buf = jax.lax.ppermute(y, "pp", perm)
            return (buf, acc), None

        (buf, acc), _ = jax.lax.scan(tick, (buf, acc),
                                     jnp.arange(m + pp - 1))
        # results live on the last stage only; psum replicates them across
        # 'pp' (every other stage holds zeros) so heads/loss run uniformly
        acc = jnp.where(stage == pp - 1, acc, jnp.zeros_like(acc))
        return jax.lax.psum(acc, "pp")

    # layer rngs may be typed key arrays (rank 1, shape (L,)) or raw
    # uint32 (L, 2) — the spec must match the leaf rank
    lr_spec = P(*(("pp",) + (None,) * (layer_rngs.ndim - 1)))
    if tp > 1:
        # fully-manual shard_map: every leaf's in_spec must state its tp
        # placement or the Megatron dims would arrive replicated (and the
        # manual psum would then double-count the partial sums)
        from .sharding import spec_for_path

        def leaf_spec(kp, leaf):
            inner = (None,) * (leaf.ndim - 1)
            rule = spec_for_path("['layers']" + jax.tree_util.keystr(kp),
                                 leaf.ndim)
            if len(rule) == leaf.ndim and rule[0] is None:
                inner = tuple(rule)[1:]
            return P(*(("pp",) + inner))
        layers_spec = jax.tree_util.tree_map_with_path(
            leaf_spec, params["layers"])
    else:
        layers_spec = P("pp")
    out = jax.shard_map(
        pipe_body, mesh=mesh,
        in_specs=(layers_spec, lr_spec, P(None, "dp", None, None)),
        out_specs=P(None, "dp", None, None), check_vma=False,
    )(params["layers"], layer_rngs, h_mb)
    # NOTE: merging (M, B/M) back to B interleaves the dp blocks, so GSPMD
    # re-lays the activation out for the (replicated-weight) head matmuls —
    # one boundary copy per step ("involuntary full rematerialization"
    # warning under tp).  Accepted: it is O(B*S*D) next to the pipeline's
    # O(L/pp) compute, and only the head/loss epilogue sees it.
    h = out.reshape(b, s, cfg.d_model)
    return cm.layernorm(params["final_ln"], h)


def pipeline_train_losses(params: dict, cfg: LinearTransformerConfig,
                          x: jax.Array, target: jax.Array, mask: jax.Array,
                          mesh: Mesh, *, n_microbatch: Optional[int] = None,
                          deterministic: bool = False,
                          rng: Optional[jax.Array] = None) -> jax.Array:
    """Per-field masked CE through the pipelined forward — drop-in for
    lt.train_losses on a ('dp','pp') mesh.  Differentiable: jax.grad runs
    the reverse pipeline (ppermute transposes to the reverse permute)."""
    from ..ops.losses import fields_cross_entropy
    h = pipeline_forward_hidden(params, cfg, x, mesh,
                                n_microbatch=n_microbatch,
                                deterministic=deterministic, rng=rng)
    logits = lt.forward_output(params, cfg, h)
    return fields_cross_entropy(logits, target, mask)


def pipeline_train_step(params, opt_state, cfg: LinearTransformerConfig, tx,
                        x, y, mask, rng, mesh: Mesh,
                        n_microbatch: Optional[int] = None
                        ) -> Tuple[dict, object, Tuple[jax.Array, jax.Array]]:
    """One Adam step through the pipelined loss (mirrors
    train/pretrain.py:agent_train_step; same loss semantics).  Not jitted
    here — callers jit with static (cfg, tx, mesh, n_microbatch)."""
    import optax

    def loss_fn(p):
        if cfg.dtype != "float32":
            p = jax.tree_util.tree_map(lambda a: a.astype(cfg.dtype), p)
        losses = pipeline_train_losses(p, cfg, x, y, mask, mesh,
                                       n_microbatch=n_microbatch,
                                       deterministic=False, rng=rng)
        return jnp.mean(losses), losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, (loss, losses)


def pipeline_grad_step(params, cfg: LinearTransformerConfig, x, y, mask,
                       rng, mesh: Mesh,
                       n_microbatch: Optional[int] = None,
                       scale: float = 1.0
                       ) -> Tuple[dict, Tuple[jax.Array, jax.Array]]:
    """Gradients + loss through the pipelined forward, no optimizer — the
    micro-batch unit of gradient accumulation on a pipeline mesh
    (VERDICT r4 #3: pp and grad-accum must compose).  The pipeline is
    already microbatched internally, so accumulation costs only the grad
    buffer: each call streams its batch through the same GPipe schedule
    and the host sums the 1/K-pre-scaled grads (train/pretrain.py).  Not
    jitted here — callers jit with static (cfg, mesh, n_microbatch,
    scale)."""
    def loss_fn(p):
        if cfg.dtype != "float32":
            p = jax.tree_util.tree_map(lambda a: a.astype(cfg.dtype), p)
        losses = pipeline_train_losses(p, cfg, x, y, mask, mesh,
                                       n_microbatch=n_microbatch,
                                       deterministic=False, rng=rng)
        return jnp.mean(losses), losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    if scale != 1.0:
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    return grads, (loss, losses)
