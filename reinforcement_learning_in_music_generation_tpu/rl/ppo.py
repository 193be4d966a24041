"""PPO + learned-reward fine-tuning (R8-R9 of SURVEY §2.3).

Reference: ppo_policy/ppo_train.py:217-528.  Actor = linear transformer
with value head, critic = trunk + per-field value heads, reward =
window-transformer eval model.  Rollout (30 episodes/song), discounted
returns, advantages = returns - values, then 10 clipped-surrogate steps
with a CE-vs-expert auxiliary loss and a critic MSE.

Defaults fix three reference defects (SURVEY §2.6 #6-#7 and the
`0.2*advantage` surrogate arm at ppo_train.py:391); `PPOConfig.
compat_forward_returns` restores the forward-order discounting.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import LinearTransformerConfig, PPOConfig, WindowTransformerConfig
from ..models import critic as critic_lib
from ..models import linear_transformer as lt
from ..models import longformer as lf
from ..train import optim


class PPOState(NamedTuple):
    actor_params: dict
    critic_params: dict
    reward_params: dict
    actor_opt: tuple
    critic_opt: tuple


def init_state(rng: jax.Array, actor_cfg: LinearTransformerConfig,
               critic_cfg: LinearTransformerConfig,
               reward_cfg: WindowTransformerConfig, cfg: PPOConfig,
               *, actor_params=None, reward_params=None) -> PPOState:
    r1, r2, r3 = jax.random.split(rng, 3)
    actor_params = actor_params or lt.init_params(r1, actor_cfg)
    critic_params = critic_lib.init_params(r2, critic_cfg)
    reward_params = reward_params or lf.init_params(r3, reward_cfg)
    atx, ctx = make_optimizers(cfg)
    return PPOState(actor_params, critic_params, reward_params,
                    atx.init(actor_params), ctx.init(critic_params))


def make_optimizers(cfg: PPOConfig):
    return optim.adam(cfg.lr), optim.adam(cfg.lr)


def _policy_logprobs(logits, n_actions: int):
    """Per-field argmax actions over the last n_actions positions and their
    log-probs (ppo_train.py:251-290 choose_action, fixed indexing)."""
    actions, logps = [], []
    for lg in logits:
        window = jax.nn.log_softmax(lg[:, -n_actions:, :], axis=-1)
        act = jnp.argmax(window, axis=-1)                       # (B, n_act)
        lp = jnp.take_along_axis(window, act[..., None], axis=-1)[..., 0]
        actions.append(act)
        logps.append(lp)
    return (jnp.stack(actions, axis=-1).astype(jnp.int32),
            jnp.stack(logps, axis=-1))


@functools.partial(jax.jit, static_argnames=("acfg", "n_actions"))
def choose_action(actor_params: dict, acfg: LinearTransformerConfig,
                  state: jax.Array, n_actions: int = 25):
    h = lt.forward_hidden(actor_params, acfg, state, deterministic=True)
    logits = lt.forward_output(actor_params, acfg, h)
    return _policy_logprobs(logits, n_actions)


@functools.partial(jax.jit, static_argnames=("state_cfgs", "episodes",
                                             "n_states", "n_actions"))
def rollout_song(state: PPOState, state_cfgs, song_x, expert_y, song_mask,
                 *, episodes: int = 30, n_states: int = 50,
                 n_actions: int = 25):
    """Device-resident rollout (ppo_train.py:460-497): 30 episodes of
    choose_action / critic value / learned reward, stacked transitions."""
    acfg, ccfg, rcfg = state_cfgs
    s0 = song_x[:n_states]

    def body(carry, num):
        cur = carry
        exp_state = jax.lax.dynamic_slice_in_dim(expert_y, num, n_states)
        exp_next = jax.lax.dynamic_slice_in_dim(expert_y, num + n_states, n_states)
        mask_state = jax.lax.dynamic_slice_in_dim(song_mask, num, n_states)
        mask_next = jax.lax.dynamic_slice_in_dim(song_mask, num + 1, n_states)
        action, logp = choose_action(state.actor_params, acfg, cur[None],
                                     n_actions=n_actions)
        action, logp = action[0], logp[0]
        next_state = jnp.concatenate([cur[:n_actions], action], axis=0)
        value = critic_lib.value_produce(
            state.critic_params, ccfg, next_state[None])[0]
        reward = lf.eval_score(state.reward_params, rcfg, next_state[None],
                               mask_state[None].astype(jnp.float32))[0, 0]
        agent_t = {
            "state": next_state,          # reference stores post-step state (:487,494)
            "action": action,
            "log_action": logp,
            "value": value[None],
            "reward": reward[None],
            "next_state": next_state,
            "done": jnp.array([0], jnp.int32),
        }
        expert_t = {
            "state": exp_state, "action": action,
            "reward": jnp.array([1.0], jnp.float32),
            "next_state": exp_next,
            "done": jnp.array([0], jnp.int32),
            "mask_state": mask_state.astype(jnp.float32),
            "mask_next_state": mask_next.astype(jnp.float32),
        }
        return next_state, (agent_t, expert_t)

    _, (agent_ts, expert_ts) = jax.lax.scan(body, s0, jnp.arange(episodes))
    return agent_ts, expert_ts


def calculate_returns(rewards: jax.Array, discount: float,
                      *, normalize: bool = True,
                      compat_forward: bool = False) -> jax.Array:
    """Discounted returns (ppo_train.py:348-357).

    Standard: R_t = r_t + gamma * R_{t+1} (reverse accumulation).  The
    reference iterates rewards in forward order while insert(0,.) —
    set compat_forward=True to reproduce (SURVEY §2.6#6)."""
    r = rewards.reshape(-1)
    if compat_forward:
        def body(acc, rv):
            acc = rv + acc * discount
            return acc, acc
        _, returns = jax.lax.scan(body, 0.0, r)
        returns = returns[::-1]
    else:
        def body(acc, rv):
            acc = rv + discount * acc
            return acc, acc
        _, returns = jax.lax.scan(body, 0.0, r, reverse=True)
    returns = returns.reshape(-1, 1)
    if normalize:
        returns = (returns - returns.mean()) / (returns.std() + 1e-8)
    return returns


def calculate_advantages(returns: jax.Array, values: jax.Array,
                         *, normalize: bool = True) -> jax.Array:
    adv = returns - values
    if normalize:
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    return adv


@functools.partial(jax.jit, static_argnames=("state_cfgs", "cfg", "txs"))
def update_policy_step(state: PPOState, state_cfgs, cfg: PPOConfig, txs,
                       agent_all: dict, expert_all: dict,
                       advantages: jax.Array, returns: jax.Array
                       ) -> Tuple[PPOState, dict]:
    """One clipped-surrogate actor update + one critic MSE update
    (ppo_train.py:380-412 inner loop body)."""
    acfg, ccfg, rcfg = state_cfgs
    atx, ctx = txs
    old_logp = jax.lax.stop_gradient(agent_all["log_action"])   # (N, n_act, 6)
    advantages = jax.lax.stop_gradient(advantages)
    returns = jax.lax.stop_gradient(returns)
    states = agent_all["state"]

    def actor_loss_fn(ap):
        h = lt.forward_hidden(ap, acfg, states, deterministic=True)
        logits = lt.forward_output(ap, acfg, h)
        _, new_logp = _policy_logprobs(logits, cfg.n_actions)
        ratio = jnp.exp(new_logp - old_logp)                 # (N, n_act, 6)
        adv = advantages[:, :, None]                         # (N,1,1)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.ppo_clip, 1.0 + cfg.ppo_clip) * adv
        policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        ce_losses = lt.train_losses(
            ap, acfg, states, expert_all["state"],
            expert_all["mask_state"], deterministic=True)
        return policy_loss + jnp.mean(ce_losses), policy_loss

    def critic_loss_fn(cp):
        values = critic_lib.value_produce(cp, ccfg, states)[:, None]
        return jnp.mean((returns - values) ** 2)

    (a_loss, p_loss), a_grads = jax.value_and_grad(
        actor_loss_fn, has_aux=True)(state.actor_params)
    v_loss, c_grads = jax.value_and_grad(critic_loss_fn)(state.critic_params)
    a_up, actor_opt = atx.update(a_grads, state.actor_opt, state.actor_params)
    actor_params = optax.apply_updates(state.actor_params, a_up)
    c_up, critic_opt = ctx.update(c_grads, state.critic_opt, state.critic_params)
    critic_params = optax.apply_updates(state.critic_params, c_up)
    new_state = PPOState(actor_params, critic_params, state.reward_params,
                         actor_opt, critic_opt)
    return new_state, {"actor_loss": a_loss, "policy_loss": p_loss,
                       "value_loss": v_loss}


def update_policy(state: PPOState, state_cfgs, cfg: PPOConfig, txs,
                  agent_all: dict, expert_all: dict,
                  advantages: jax.Array, returns: jax.Array, rng: jax.Array
                  ) -> Tuple[PPOState, dict]:
    """cfg.ppo_steps updates (ppo_train.py:365-417).

    Host loop over one jitted step rather than a `lax.scan` over grad
    steps — the scanned form compiles fine on CPU but stalls the axon TPU
    compiler; per-step dispatch overhead is negligible next to the
    fwd+bwd work."""
    metrics_acc = []
    for _ in range(cfg.ppo_steps):
        state, metrics = update_policy_step(
            state, state_cfgs, cfg, txs, agent_all, expert_all,
            advantages, returns)
        metrics_acc.append(metrics)
    mean = {k: jnp.mean(jnp.stack([m[k] for m in metrics_acc]))
            for k in metrics_acc[0]}
    return state, mean
