"""AIRL discriminator trainer (R7 of SURVEY §2.3).

Reference: dqn_policy/AIRL.py:33-236 `RewardDiscri`: a window-transformer
discriminator trained with expert-BCE(->1) + agent-BCE(->0) + an LM-style
CE term, then used to re-score both replay buffers as rewards.

Here the per-minibatch step is jitted and the epoch is a `lax.scan` over
minibatches; reward scoring scans the full buffer on-device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import AIRLConfig, WindowTransformerConfig
from ..models import longformer as lf
from ..ops.losses import binary_cross_entropy
from ..train import optim


class AIRLState(NamedTuple):
    params: dict
    bn_state: dict
    opt_state: tuple


def make_optimizer(cfg: AIRLConfig):
    sched = optim.step_lr(cfg.lr, cfg.lr_step, cfg.lr_gamma)
    return optim.adam(sched)


def init_state(rng: jax.Array, mcfg: WindowTransformerConfig,
               cfg: AIRLConfig) -> AIRLState:
    params = lf.init_params(rng, mcfg)
    tx = make_optimizer(cfg)
    return AIRLState(params, lf.init_state(mcfg), tx.init(params))


@functools.partial(jax.jit, static_argnames=("mcfg", "tx"))
def disc_step(state: AIRLState, mcfg: WindowTransformerConfig, tx,
              expert_states, expert_masks, agent_states, rng
              ) -> Tuple[AIRLState, dict]:
    """One minibatch update (AIRL.py:142-182):
    global = BCE(D(expert)->1) + BCE(D(agent)->0) + CE_token(agent|expert)."""

    def loss_fn(params):
        r1, r2, r3 = jax.random.split(rng, 3)
        exp_score, bn1 = lf.score_forward(
            params, mcfg, expert_states, expert_masks, state.bn_state,
            train=True, deterministic=False, rng=r1)
        agent_score, bn2 = lf.score_forward(
            params, mcfg, agent_states, expert_masks, bn1,
            train=True, deterministic=False, rng=r2)
        exp_bce = binary_cross_entropy(exp_score, jnp.ones_like(exp_score))
        agent_bce = binary_cross_entropy(agent_score, jnp.zeros_like(agent_score))
        ce = lf.token_ce(params, mcfg, agent_states, expert_states,
                         expert_masks, deterministic=False, rng=r3)
        total = exp_bce + agent_bce + ce
        return total, (exp_bce, agent_bce, ce, bn2)

    (total, (exp_bce, agent_bce, ce, bn_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return AIRLState(params, bn_state, opt_state), {
        "expert_loss": exp_bce, "agent_loss": agent_bce,
        "ce_loss": ce, "global_loss": total}


@functools.partial(jax.jit, static_argnames=("mcfg", "tx", "batch_size"))
def disc_epoch(state: AIRLState, mcfg: WindowTransformerConfig, tx,
               expert_states, expert_masks, agent_states, rng,
               batch_size: int) -> Tuple[AIRLState, dict]:
    """One pass over the buffers in minibatches via lax.scan
    (AIRL.py:136-212 inner loop)."""
    n = expert_states.shape[0]
    nb = n // batch_size
    cut = nb * batch_size
    es = expert_states[:cut].reshape(nb, batch_size, *expert_states.shape[1:])
    em = expert_masks[:cut].reshape(nb, batch_size, *expert_masks.shape[1:])
    ag = agent_states[:cut].reshape(nb, batch_size, *agent_states.shape[1:])
    rngs = jax.random.split(rng, nb)

    def body(st, inp):
        e, m, a, r = inp
        st, metrics = disc_step(st, mcfg, tx, e, m, a, r)
        return st, metrics

    state, metrics = jax.lax.scan(body, state, (es, em, ag, rngs))
    return state, jax.tree_util.tree_map(jnp.mean, metrics)


@functools.partial(jax.jit, static_argnames=("mcfg", "batch_size"))
def calculate_reward(state: AIRLState, mcfg: WindowTransformerConfig,
                     states, masks, batch_size: int = 100) -> jax.Array:
    """Score a whole buffer (AIRL.py:69-90): (N, S, 6) -> (N, 1), batchwise
    scan, no grad, BN state not persisted.

    BN mode: the reference's calculate_reward calls `disc_model.eval()`
    (AIRL.py:75) but its `all_forward` immediately re-enters
    `disc_model.train()` (AIRL.py:63), so the reference ACTUALLY scores
    with per-batch BN statistics — and that is also the only mode in which
    this architecture separates: disc_step normalizes expert and agent
    minibatches separately in training, which strips the class-mean signal
    from the running stats, so frozen-stats eval scoring comes out
    near-0.5 or inverted (measured r3: train-mode BCE 0.004 yet eval
    scores agent 0.84 / expert 0.29).  train=True batch-stats scoring here
    reproduces the behavior the reference's curves were made with; the
    updated running stats are discarded (state is not returned)."""
    n = states.shape[0]
    nb = n // batch_size
    cut = nb * batch_size
    ss = states[:cut].reshape(nb, batch_size, *states.shape[1:])
    mm = masks[:cut].reshape(nb, batch_size, *masks.shape[1:])

    def body(_, inp):
        s, m = inp
        score, _ = lf.score_forward(state.params, mcfg, s, m, state.bn_state,
                                    train=True, deterministic=True)
        return None, score

    _, scores = jax.lax.scan(body, None, (ss, mm))
    scores = scores.reshape(cut, 1)
    if cut < n:  # ragged tail
        tail, _ = lf.score_forward(state.params, mcfg, states[cut:], masks[cut:],
                                   state.bn_state, train=True, deterministic=True)
        scores = jnp.concatenate([scores, tail], axis=0)
    return scores


def update_disc(state: AIRLState, mcfg: WindowTransformerConfig,
                cfg: AIRLConfig, tx, agent_buffer: dict, expert_buffer: dict,
                rng: jax.Array, *, train: bool = True):
    """Full discriminator update + buffer re-scoring (AIRL.py:121-236).

    Returns (state, agent_rewards (N,1), expert_rewards (N,1), metrics)."""
    metrics_hist = []
    if train:
        for _ in range(cfg.epochs):
            rng, ep_rng = jax.random.split(rng)
            state, metrics = disc_epoch(
                state, mcfg, tx,
                expert_buffer["state"], expert_buffer["mask_state"],
                agent_buffer["state"], ep_rng, cfg.batch_size)
            metrics_hist.append({k: float(v) for k, v in metrics.items()})
    score_bs = getattr(cfg, "score_batch_size", cfg.batch_size)
    agent_r = calculate_reward(state, mcfg, agent_buffer["state"],
                               expert_buffer["mask_state"], score_bs)
    expert_r = calculate_reward(state, mcfg, expert_buffer["state"],
                                expert_buffer["mask_state"], score_bs)
    return state, agent_r, expert_r, metrics_hist


def gradient_penalty(state: AIRLState, mcfg: WindowTransformerConfig,
                     expert_states, agent_states, masks, rng,
                     lambda_term: float = 5.0) -> jax.Array:
    """WGAN-GP on interpolated embeddings — the reference defines this but
    never calls it and marks it '# Error #' (AIRL.py:93-118); provided here
    working: interpolation happens in embedding space (token ids are
    discrete), gradient taken w.r.t. the interpolated embedding.  The score
    path is lf.score_from_embeddings — the same trunk score_forward uses, so
    it cannot silently diverge from the discriminator."""
    from ..models import common as cm

    eta = jax.random.uniform(rng, (expert_states.shape[0], 1, 1))
    e_emb = cm.embed_fields(state.params["emb"], expert_states)
    a_emb = cm.embed_fields(state.params["emb"], agent_states)
    inter = eta * e_emb + (1.0 - eta) * a_emb

    def score_of_emb(emb):
        score, _ = lf.score_from_embeddings(
            state.params, mcfg, emb, masks, state.bn_state,
            train=False, deterministic=True)
        return score.sum()

    grads = jax.grad(score_of_emb)(inter)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2) * lambda_term
