"""DQN policy over CP token actions (R5-R6 of SURVEY §2.3).

Reference: dqn_policy/IRL_dqn_train.py:210-383.  eval/target nets are
linear transformers; actions are the per-field argmaxes over the last
N_ACTIONS positions; TD loss gathers Q(s,a) per field against
reward + gamma * (1-done) * topk(max_a' Q_target), combined with a
0.3*MSE + 0.7*CE(agent_state -> expert_next_state) composite
(IRL_dqn_train.py:317-336).

All steps are jitted; the teacher-forced env loop (:442-498) becomes a
`lax.scan` rollout producing a whole song's transitions in one device
program (rl/env.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import DQNConfig, LinearTransformerConfig
from ..models import linear_transformer as lt
from ..train import optim


class DQNState(NamedTuple):
    eval_params: dict
    target_params: dict
    opt_state: tuple
    target_count: jax.Array    # () int32


def make_optimizer(cfg: DQNConfig):
    sched = optim.multistep_lr(cfg.lr, cfg.lr_milestones, cfg.lr_gamma)
    return optim.adam(sched)


def init_state(rng: jax.Array, mcfg: LinearTransformerConfig, cfg: DQNConfig,
               pretrain_params: dict | None = None) -> DQNState:
    eval_params = pretrain_params or lt.init_params(rng, mcfg)
    target_params = jax.tree_util.tree_map(jnp.copy, eval_params)
    tx = make_optimizer(cfg)
    return DQNState(eval_params, target_params, tx.init(eval_params),
                    jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("mcfg", "n_actions"))
def choose_action(params: dict, mcfg: LinearTransformerConfig,
                  state: jax.Array, n_actions: int = 25) -> jax.Array:
    """state (B, S, 6) -> action (B, n_actions, 6): per-field argmax over the
    last n_actions positions (IRL_dqn_train.py:240-264; the reference's
    `-idx` loop starts at -0 == position 0 — we take the true last-window
    positions in temporal order, the evident intent)."""
    h = lt.forward_hidden(params, mcfg, state, deterministic=True)
    logits = lt.forward_output(params, mcfg, h)
    picks = [jnp.argmax(lg[:, -n_actions:, :], axis=-1) for lg in logits]
    return jnp.stack(picks, axis=-1).astype(jnp.int32)


def _q_gather(logits, actions):
    """Q(s,a) per field: gather along vocab at the last n_actions positions
    (IRL_dqn_train.py:287-292)."""
    n_act = actions.shape[1]
    window = logits[:, -n_act:, :]
    return jnp.take_along_axis(window, actions[..., None], axis=-1)[..., 0]


@functools.partial(jax.jit, static_argnames=("mcfg", "cfg", "tx"))
def update(state: DQNState, mcfg: LinearTransformerConfig, cfg: DQNConfig,
           tx, batch: dict, expert_batch: dict, rng: jax.Array
           ) -> Tuple[DQNState, dict]:
    """One DQN update (IRL_dqn_train.py:267-348).

    batch: agent transitions {'state','action','reward','next_state','done'};
    expert_batch: {'state','next_state','mask_next_state'} for the CE term.
    Target net hard-syncs every cfg.target_update calls (:269-271).
    """
    sync = (state.target_count % cfg.target_update) == 0
    target_params = jax.tree_util.tree_map(
        lambda t, e: jnp.where(sync, e, t), state.target_params, state.eval_params)

    a_state = batch["state"]
    a_action = batch["action"]
    a_reward = batch["reward"]            # (B,1)
    a_next = batch["next_state"]
    a_done = batch["done"].astype(jnp.float32)

    def loss_fn(eval_params):
        h = lt.forward_hidden(eval_params, mcfg, a_state, deterministic=True)
        logits = lt.forward_output(eval_params, mcfg, h)
        qvals = [_q_gather(lg, a_action[..., i]) for i, lg in enumerate(logits)]

        ht = lt.forward_hidden(target_params, mcfg, a_next, deterministic=True)
        tlogits = lt.forward_output(target_params, mcfg, ht)
        mse = 0.0
        for q, tlg in zip(qvals, tlogits):
            max_q = jnp.max(tlg, axis=-1)                       # (B,S)
            topk, _ = jax.lax.top_k(max_q, a_action.shape[1])   # (B,n_actions)
            topk = jax.lax.stop_gradient(topk)
            target = a_reward + cfg.gamma * (1.0 - a_done) * topk
            mse = mse + jnp.mean((q - target) ** 2)
        mse = mse / len(qvals)

        ce_losses = lt.train_losses(
            eval_params, mcfg, a_state, expert_batch["next_state"],
            expert_batch["mask_next_state"], deterministic=False, rng=rng)
        ce = jnp.mean(ce_losses)
        total = cfg.alpha * mse + (1.0 - cfg.alpha) * ce
        return total, (mse, ce)

    (total, (mse, ce)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.eval_params)
    updates, opt_state = tx.update(grads, state.opt_state, state.eval_params)
    eval_params = optax.apply_updates(state.eval_params, updates)
    new_state = DQNState(eval_params, target_params, opt_state,
                         state.target_count + 1)
    return new_state, {"mse": mse, "ce": ce, "total": total}
