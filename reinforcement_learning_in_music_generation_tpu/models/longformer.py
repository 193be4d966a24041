"""Sliding-window ("Longformer"-style) CP-token encoders.

One parameterized family replacing the reference's three HF LongformerModel
variants:

  * AIRL discriminator — 10 layers, window 50, score_classifier MLP head
    (dqn_policy/AIRL_model.py:46-171)
  * PPO reward model — 12 layers, window 512, per-field scalar eval heads
    (ppo_policy/IRL_model.py:46-163, ppo_policy/model.py:400-495)
  * discrim-pretrain LM — 12 layers, window 512, absolute positions, 7 fields
    (dqn_policy/discrim-pretrain.py:216-334)

Trunk: CP field embeddings -> proj(d_model) -> +learned absolute positions
-> LN -> N x [windowed attn -> add&LN -> gelu FFN -> add&LN], the BERT
post-norm layout HF uses.  Window attention via ops/window_attention.py.

Note on `position_embedding_type="relative_key"` (AIRL_model.py:85): HF's
LongformerSelfAttention ignores that setting — the model actually applies
absolute learned positions at the input — so absolute is the faithful
default here; a true relative_key score term is available via config.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import WindowTransformerConfig
from ..ops.losses import fields_cross_entropy
from ..ops.window_attention import window_attention
from . import common as cm


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_layer(rng: jax.Array, cfg: WindowTransformerConfig) -> dict:
    ks = jax.random.split(rng, 6)
    d = cfg.d_model
    p = {
        "wq": cm.init_linear(ks[0], d, d),
        "wk": cm.init_linear(ks[1], d, d),
        "wv": cm.init_linear(ks[2], d, d),
        "wo": cm.init_linear(ks[3], d, d),
        "ln1": cm.init_layernorm(d),
        "ln2": cm.init_layernorm(d),
        "ffn1": cm.init_linear(ks[4], d, cfg.d_inner),
        "ffn2": cm.init_linear(ks[5], cfg.d_inner, d),
    }
    return p


def init_params(rng: jax.Array, cfg: WindowTransformerConfig) -> dict:
    k_emb, k_proj, k_pos, k_layers, k_heads, k_score, k_eval, k_rel = (
        jax.random.split(rng, 8))
    layer_keys = jax.random.split(k_layers, cfg.n_layer)
    names = cm.field_names(cfg.n_fields)
    params = {
        "emb": cm.init_field_embeddings(k_emb, cfg.vocab_sizes, cfg.emb_sizes),
        "proj": cm.init_linear(k_proj, sum(cfg.emb_sizes), cfg.d_model),
        "pos_emb": jax.random.normal(k_pos, (cfg.max_pos, cfg.d_model)) * 0.02,
        "emb_ln": cm.init_layernorm(cfg.d_model),
        "layers": jax.vmap(lambda k: _init_layer(k, cfg))(layer_keys),
        # per-field token heads (AIRL_model.py:70-75)
        "heads": cm.init_field_heads(k_heads, cfg.d_model, cfg.vocab_sizes),
    }
    if cfg.position_embedding_type == "relative_key":
        max_rel = 64
        params["rel_emb"] = (
            jax.random.normal(k_rel, (2 * max_rel + 1, cfg.d_head)) * 0.02)
    if cfg.with_score_head:
        ks1, ks2, ks3 = jax.random.split(k_score, 3)
        params["score"] = {
            "l1": cm.init_linear(ks1, cfg.d_model, 128),
            "bn": {"scale": jnp.ones((128,)), "bias": jnp.zeros((128,))},
            "l2": cm.init_linear(ks2, 128, 64),
            "l3": cm.init_linear(ks3, 64, 1),
        }
    if cfg.with_eval_heads:
        eval_keys = jax.random.split(k_eval, cfg.n_fields)
        params["eval_heads"] = {
            n: cm.init_linear(k, v, 1)
            for n, k, v in zip(names, eval_keys, cfg.vocab_sizes)
        }
    return params


def init_state(cfg: WindowTransformerConfig) -> dict:
    """Mutable running stats for the score head's BatchNorm1d
    (AIRL_model.py:93)."""
    if not cfg.with_score_head:
        return {}
    return {
        "bn_mean": jnp.zeros((128,)),
        "bn_var": jnp.ones((128,)),
    }


# ---------------------------------------------------------------------------
# trunk
# ---------------------------------------------------------------------------

def forward(params: dict, cfg: WindowTransformerConfig, x: jax.Array,
            attention_mask: Optional[jax.Array] = None, *,
            deterministic: bool = True,
            rng: Optional[jax.Array] = None) -> jax.Array:
    """x (B, S, n_fields) int -> sequence output (B, S, D).

    AIRL_model.py:101-118 (embeddings -> proj -> longformer)."""
    embs = cm.embed_fields(params["emb"], x)
    return forward_from_embeddings(params, cfg, embs, attention_mask,
                                   deterministic=deterministic, rng=rng)


def forward_from_embeddings(params: dict, cfg: WindowTransformerConfig,
                            embs: jax.Array,
                            attention_mask: Optional[jax.Array] = None, *,
                            deterministic: bool = True,
                            rng: Optional[jax.Array] = None) -> jax.Array:
    """Trunk entry taking pre-computed field-concat embeddings
    (B, S, sum(emb_sizes)) — HF's `inputs_embeds` path (AIRL_model.py:104).
    Used by `forward` and by rl/airl.py's WGAN gradient penalty, which needs
    gradients w.r.t. a continuous interpolation of embeddings."""
    b, s = embs.shape[0], embs.shape[1]
    h = cm.linear(params["proj"], embs)
    h = h + params["pos_emb"][None, :s]
    h = cm.layernorm(params["emb_ln"], h)
    rngs = (jax.random.split(rng, cfg.n_layer)
            if (rng is not None and not deterministic) else [None] * cfg.n_layer)
    rel = params.get("rel_emb")

    def layer(h, lp, lr):
        r1 = r2 = None
        if lr is not None:
            r1, r2 = jax.random.split(lr)
        from .linear_transformer import _ffn_backend
        import os as _os
        # an explicit RLMG_WINDOW_BACKEND=pallas request (the flash-band
        # kernel, (B,H,S,D) layout) must not be silently dropped by the
        # fused-tail route, whose attention is the head-minor XLA form
        if (_os.environ.get("RLMG_WINDOW_BACKEND") != "pallas"
                and _ffn_backend(b * s) == "pallas-tail"):
            # fused post-attention tail (same kernel as the agent model,
            # mid_drop=False: this layer has no post-gelu dropout) + the
            # head-minor window attention so q/k/v/att never transpose
            # at the opaque kernel boundary
            from ..ops.ffn_block import attn_tail_block
            from ..ops.window_attention import window_attention_bshe
            import os as _os
            bshe = lambda x: x.reshape(b, s, cfg.n_head, cfg.d_head)
            att = window_attention_bshe(
                bshe(cm.linear(lp["wq"], h)), bshe(cm.linear(lp["wk"], h)),
                bshe(cm.linear(lp["wv"], h)), attention_mask,
                window=cfg.attention_window, rel_emb=rel)
            # rng=None means "no dropout" (cm.dropout semantics) — p must
            # follow r1, else the fused path would apply identical
            # seed-0 masks every layer/step
            p = 0.0 if (deterministic or r1 is None) else cfg.dropout
            seed = (jax.random.randint(r1, (), 0, 2 ** 30, dtype=jnp.int32)
                    if p > 0.0 else jnp.int32(0))
            out = attn_tail_block(
                h.reshape(b * s, cfg.d_model),
                att.reshape(b * s, cfg.d_model),
                lp["wo"]["w"], lp["wo"]["b"],
                lp["ln1"]["scale"], lp["ln1"]["bias"],
                lp["ffn1"]["w"], lp["ffn1"]["b"],
                lp["ffn2"]["w"], lp["ffn2"]["b"],
                lp["ln2"]["scale"], lp["ln2"]["bias"], seed, p,
                int(_os.environ.get("RLMG_FFN_BLOCK", "256")),
                _os.environ.get("RLMG_FFN_INTERPRET") == "1", False)
            return out.reshape(b, s, cfg.d_model)
        q = cm.linear(lp["wq"], h).reshape(b, s, cfg.n_head, cfg.d_head).transpose(0, 2, 1, 3)
        k = cm.linear(lp["wk"], h).reshape(b, s, cfg.n_head, cfg.d_head).transpose(0, 2, 1, 3)
        v = cm.linear(lp["wv"], h).reshape(b, s, cfg.n_head, cfg.d_head).transpose(0, 2, 1, 3)
        att = window_attention(q, k, v, attention_mask,
                               window=cfg.attention_window, rel_emb=rel)
        att = att.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        att = cm.linear(lp["wo"], att)
        h = cm.layernorm(lp["ln1"], h + cm.dropout(r1, att, cfg.dropout, deterministic))
        y = jax.nn.gelu(cm.linear(lp["ffn1"], h), approximate=False)
        y = cm.linear(lp["ffn2"], y)
        h = cm.layernorm(lp["ln2"], h + cm.dropout(r2, y, cfg.dropout, deterministic))
        return h

    # Window sizes differ per config; layer params are stacked but attention
    # has data-dependent masking only, so a python loop over unstacked params
    # would also work — scan keeps compile time flat for 12 layers.
    def body(h, inp):
        lp, lr = inp
        return layer(h, lp, lr), None

    unroll = min(getattr(cfg, "scan_unroll", 1), cfg.n_layer)
    if rngs[0] is None:
        h, _ = jax.lax.scan(lambda h, lp: (layer(h, lp, None), None),
                            h, params["layers"], unroll=unroll)
    else:
        h, _ = jax.lax.scan(body, h, (params["layers"], jnp.stack(rngs)),
                            unroll=unroll)
    return h


# ---------------------------------------------------------------------------
# heads
# ---------------------------------------------------------------------------

def _batchnorm(p: dict, state: dict, x: jax.Array, train: bool,
               momentum: float = 0.1, eps: float = 1e-5
               ) -> Tuple[jax.Array, dict]:
    if train:
        mu = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        new_state = {
            "bn_mean": (1 - momentum) * state["bn_mean"] + momentum * mu,
            "bn_var": (1 - momentum) * state["bn_var"] + momentum * var,
        }
    else:
        mu, var = state["bn_mean"], state["bn_var"]
        new_state = state
    y = (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_state


def _score_head(params: dict, state: dict, h: jax.Array, train: bool
                ) -> Tuple[jax.Array, dict]:
    """score_classifier MLP (AIRL_model.py:91-99): mean-pool -> Linear ->
    BatchNorm -> tanh -> Linear -> tanh -> Linear -> sigmoid."""
    pooled = jnp.mean(h, axis=1)
    sc = params["score"]
    y = cm.linear(sc["l1"], pooled)
    y, new_state = _batchnorm(sc["bn"], state, y, train)
    y = jnp.tanh(y)
    y = jnp.tanh(cm.linear(sc["l2"], y))
    y = jax.nn.sigmoid(cm.linear_scalar(sc["l3"], y))[..., None]
    return y, new_state


def score_forward(params: dict, cfg: WindowTransformerConfig, x: jax.Array,
                  attention_mask: Optional[jax.Array], state: dict, *,
                  train: bool = False, deterministic: bool = True,
                  rng: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, dict]:
    """Realness score in (0,1): mean-pool -> MLP w/ BatchNorm -> sigmoid
    (AIRL_model.py:101-122). Returns (score (B,1), new bn state)."""
    h = forward(params, cfg, x, attention_mask,
                deterministic=deterministic, rng=rng)
    return _score_head(params, state, h, train)


def score_from_embeddings(params: dict, cfg: WindowTransformerConfig,
                          embs: jax.Array,
                          attention_mask: Optional[jax.Array], state: dict, *,
                          train: bool = False, deterministic: bool = True,
                          rng: Optional[jax.Array] = None
                          ) -> Tuple[jax.Array, dict]:
    """score_forward on pre-computed embeddings — the differentiable entry
    rl/airl.py's WGAN gradient penalty needs (AIRL.py:93-118 interpolates in
    input space; token ids are discrete, so we interpolate embeddings)."""
    h = forward_from_embeddings(params, cfg, embs, attention_mask,
                                deterministic=deterministic, rng=rng)
    return _score_head(params, state, h, train)


def token_logits(params: dict, cfg: WindowTransformerConfig, x: jax.Array,
                 attention_mask: Optional[jax.Array] = None, *,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> Tuple[jax.Array, ...]:
    """Per-field logits over the sequence (AIRL_model.py:131-153,
    discrim-pretrain.py forward_output)."""
    h = forward(params, cfg, x, attention_mask,
                deterministic=deterministic, rng=rng)
    return cm.apply_field_heads(params["heads"], h, cfg.n_fields)


def token_ce(params: dict, cfg: WindowTransformerConfig, x: jax.Array,
             target: jax.Array, mask: jax.Array, *,
             deterministic: bool = True,
             rng: Optional[jax.Array] = None) -> jax.Array:
    """Mean masked CE over fields — AIRL token_forward
    (AIRL_model.py:131-170).  (The reference's compute_CEloss reduces with
    an unmasked mean before applying the mask, making the mask a no-op; we
    implement the masked intent — SURVEY §2.6 guidance.)"""
    logits = token_logits(params, cfg, x, mask, deterministic=deterministic, rng=rng)
    return jnp.mean(fields_cross_entropy(logits, target, mask))


def eval_score(params: dict, cfg: WindowTransformerConfig, x: jax.Array,
               attention_mask: Optional[jax.Array] = None, *,
               deterministic: bool = True,
               rng: Optional[jax.Array] = None) -> jax.Array:
    """PPO reward model scalar score (B,1): sigmoid of per-field scalar
    heads, averaged (ppo_policy/IRL_model.py:128-163, model.py:459-495)."""
    logits = token_logits(params, cfg, x, attention_mask,
                          deterministic=deterministic, rng=rng)
    names = cm.field_names(cfg.n_fields)
    total = 0.0
    for n, lg in zip(names, logits):
        hid = jnp.mean(cm.linear_scalar(params["eval_heads"][n], lg),
                       axis=1)[..., None]                               # (B,1)
        total = total + jax.nn.sigmoid(hid)
    return total / len(names)
